{
  "queries": ["WITH m1 (clicks) AS (SELECT count(*) AS clicks FROM events WHERE event_type='click' GROUP BY user_id % 2), m2 (total) AS (SELECT count(*) AS total FROM events GROUP BY user_id % 2) SELECT clicks, total, clicks/total AS share FROM m1 NATURAL LEFT JOIN m2"]
}
