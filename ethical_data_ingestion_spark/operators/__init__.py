"""Operator library: composable DataFrame→DataFrame functions.

Each module mirrors a family from SURVEY §2:

    search.py       §2.2 projections/filters/predicates (#15-20) + top-k (#25)
    analytics.py    §2.3 aggregates / sorts / greatest-n-per-group (#21-29)
    joins.py        star-schema join queries (extension; reference has only
                    the correlated subquery #24)
    dedup.py        exact + MinHash-LSH + SimHash + n-gram-Jaccard +
                    embedding-cosine near-duplicate detection
    similarity.py   vector similarity search (brute-force + LSH-bucketed)
    text.py         language-ID, quality scoring, token counting,
                    fingerprinting over the documents table
    windows.py      event-time windowing (tumbling/sliding/session) in batch
    multimodal.py   binary-column (image/audio/video) plumbing with stubbed
                    decoders
"""
