"""V-optimal histogram construction (Jagadish et al., VLDB'98).

Given an equi-width pre-binned count vector, choose B bucket
boundaries minimizing the total within-bucket SSE of the counts —
the synopsis the classic selectivity-estimation literature proves
optimal among bucketing schemes.  The DP is O(B * n^2) on the
PRE-AGGREGATED n-bin relation (n = 64 here), so at 100 TB the corpus
contributes exactly one histogram aggregate and the solve stays a
bounded in-plan step (the pca.py one-partition pattern: repartition
the n-row relation to one partition and solve inside a single Arrow
batch — nothing is collected to the driver).

Float discipline (shared with the SQL oracle in
queries_distributed.voptimal_histogram): every SSE is computed as
``(S2[j]-S2[k]) - (S[j]-S[k])^2 / (j-k)`` from int64 prefix sums in
exactly that operation order, and the DP recurrence adds in the same
structural order — so the double values are bit-identical between
numpy and the oracle's chained-CTE DP, and argmin tie-breaks (lowest
split index) agree.
"""

from __future__ import annotations


def voptimal_dp(counts: list[int], n_buckets: int):
    """DP solve: returns (boundaries, per-bucket sse list, total_sse).

    ``boundaries`` is the list of prefix indices [k_0=0, k_1, ...,
    k_B=n]; bucket b spans bins [k_{b-1}, k_b).  Pure Python/float
    arithmetic in oracle-identical op order; ties in the argmin take
    the LOWEST k (the oracle's ORDER BY e, k LIMIT 1).
    """
    n = len(counts)
    s = [0] * (n + 1)
    s2 = [0] * (n + 1)
    for i, c in enumerate(counts):
        s[i + 1] = s[i] + c
        s2[i + 1] = s2[i] + c * c

    def sse(k: int, j: int) -> float:
        d = s[j] - s[k]
        return (s2[j] - s2[k]) - d * d / (j - k)

    inf = float("inf")
    e = [[inf] * (n + 1) for _ in range(n_buckets + 1)]
    arg = [[0] * (n + 1) for _ in range(n_buckets + 1)]
    for j in range(1, n + 1):
        e[1][j] = sse(0, j)
    for b in range(2, n_buckets + 1):
        for j in range(b, n + 1):
            best, bestk = inf, -1
            for k in range(b - 1, j):
                v = e[b - 1][k] + sse(k, j)
                if v < best:  # strict: first (lowest k) wins ties
                    best, bestk = v, k
            e[b][j] = best
            arg[b][j] = bestk
    bounds = [n]
    j = n
    for b in range(n_buckets, 1, -1):
        j = arg[b][j]
        bounds.append(j)
    bounds.append(0)
    bounds.reverse()
    sses = [sse(bounds[i], bounds[i + 1]) for i in range(n_buckets)]
    return bounds, sses, e[n_buckets][n]
