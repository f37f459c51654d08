"""Registered driver-contract queries, grouped by operator family.

    parity.py       the reference's own SQL surface (SURVEY §2.2-2.3)
    relational.py   flagship pricing summary + star-schema joins
    dedup_q.py      deduplication family
    similarity_q.py vector similarity search
    text_q.py       text analysis family
    windows_q.py    event-time windowing + JSON extraction over events
    corpus_q.py     benchmark decontamination, length histogram,
                    deterministic embedding k-means
"""
