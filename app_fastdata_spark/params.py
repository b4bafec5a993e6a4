"""Deterministic query parameters.

The reference's serving queries take (window_seconds, top_k) and use
wall-clock NOW (GetTopUsers.java:29, web/js/demo.js:4). For reproducible
oracle comparison NOW is replaced by an explicit ``AS_OF`` pinned just
past the testdata's max timestamp (SURVEY.md §5 determinism notes), and
the 60 s dashboard window scales to 7 days to match the testdata's
one-month span (TESTDATA.md).
"""

AS_OF = "2024-01-31 00:00:00"          # fixed NOW substitute (second-aligned)
WINDOW_SECONDS = 7 * 86400             # "last N seconds" recency window (P6)
TOP_K = 10                             # dashboard LIMIT (demo.js:4)
SESSION_GAP_SECONDS = 1800             # 30 s inactivity gap, scaled ×60 for
                                       # the sparse testdata (NewEvent.java:41)
RETENTION_CUTOFF = "2024-01-15 00:00:00"  # DeleteAfterDate ts<=? stand-in
NTH_OLDEST = 100                       # OFFSET for chunked-delete Nth-ts (T5)
