{
  "queries": ["SELECT count(*) AS value FROM events WHERE event_type='click' AND aql_time_filter(ts, \"24 hours ago\", \"this quarter-hour\", UTC) AND aql_now(ts, 1706190420) GROUP BY aql_time_bucket_hour(ts, \"\", UTC)"]
}
