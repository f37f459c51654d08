"""Ingestion sources: adapters, compliance gating, robots parsing.

Network-free by design in tests — adapters accept pre-fetched payloads
(fixtures) exactly where the reference would have issued HTTP GETs.
"""
