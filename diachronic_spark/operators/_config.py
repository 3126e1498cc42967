"""Shared operator tuning constants (neutral home — no operator family
owns these).

LOCAL_EDGE_THRESHOLD: auto-dispatch bound for graph duals
(connected components, pagerank): at or below it the edge set is
collected and solved on the driver (union-find / dense iteration);
above it the distributed per-iteration join+min loop runs. Sized so
the driver copy stays ~100 MB (2 longs + overhead per edge) — far
below executor-OOM territory, far above any LSH pair set the fixtures
produce; the distributed loop is the safe shape past it.
"""

LOCAL_EDGE_THRESHOLD = 2_000_000
