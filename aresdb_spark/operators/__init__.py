"""Data-pipeline operators beyond the reference's query surface.

These are the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) — first-class
components of the engine, each designed for 100 TB scale:

  - ``text``       language-ID, quality scoring, token counting, fingerprints
  - ``dedup``      exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  - ``similarity`` brute-force cosine top-k + LSH-bucketed ANN
  - ``multimodal`` binary-column decode/feature plumbing (mapInPandas)
  - ``jpeg``       clean-room baseline JPEG codec (ITU-T T.81)
  - ``audio``      clean-room WAV (RIFF PCM) codec + waveform stats
  - ``video``      clean-room ISO BMFF (MP4) metadata probe

Everything stays in JVM expressions (no Python UDFs) except where
vectorized math genuinely wins (SimHash packing, ANN re-rank), which use
Arrow-batched pandas transforms.
"""
