"""Taxonomy similarity (J8) — path / Leacock–Chodorow / Wu–Palmer over the
SCO class tree.

Reference: /root/reference/src/main/java/n10s/similarity/Similarities.java
(:29-72 Cypher path queries; :74-128 pathSim). The ontology is metadata-
sized, so the tree is collected to the driver once, depths + LCA computed
in Python, and the pairwise similarity exposed as a broadcast-joinable
DataFrame — the same small-graph/big-table split the reference uses.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Taxonomy:
    def __init__(self, edges: DataFrame, rel: str = "SCO"):
        """edges(src, rel, dst): child SCO parent (tree or DAG; ties broken
        by lexicographic parent for determinism)."""
        rows = edges.filter(F.col("rel") == rel).select("src", "dst").collect()
        self.parent: Dict[str, str] = {}
        for r in sorted(rows, key=lambda r: (r["src"], r["dst"])):
            self.parent.setdefault(r["src"], r["dst"])
        self.nodes = set(self.parent) | set(self.parent.values())
        self._depth: Dict[str, int] = {}
        for n in self.nodes:
            self.depth(n)
        self.max_depth = max(self._depth.values()) if self._depth else 0

    def depth(self, n: str) -> int:
        if n in self._depth:
            return self._depth[n]
        seen = []
        cur = n
        while cur in self.parent and cur not in self._depth and cur not in seen:
            seen.append(cur)
            cur = self.parent[cur]
        base = self._depth.get(cur, 0)
        for i, m in enumerate(reversed(seen)):
            self._depth[m] = base + i + 1
        return self._depth.get(n, 0)

    def _ancestors(self, n: str) -> List[str]:
        out = [n]
        cur = n
        while cur in self.parent:
            cur = self.parent[cur]
            if cur in out:
                break
            out.append(cur)
        return out

    def lca(self, a: str, b: str) -> Optional[str]:
        anc_a = self._ancestors(a)
        set_a = set(anc_a)
        for x in self._ancestors(b):
            if x in set_a:
                return x
        return None

    def path_length(self, a: str, b: str) -> Optional[int]:
        l = self.lca(a, b)
        if l is None:
            return None
        return (self.depth(a) - self.depth(l)) + (self.depth(b) - self.depth(l))

    # --------- the three measures (Similarities.java:29-72)
    def path_sim(self, a: str, b: str) -> Optional[float]:
        p = self.path_length(a, b)
        return None if p is None else 1.0 / (1.0 + p)

    def lch_sim(self, a: str, b: str) -> Optional[float]:
        p = self.path_length(a, b)
        if p is None:
            return None
        d = max(self.max_depth, 1)
        return -math.log((p + 1) / (2.0 * d))

    def wup_sim(self, a: str, b: str) -> Optional[float]:
        l = self.lca(a, b)
        if l is None:
            return None
        # 1-based depths (root = 1), the standard Wu–Palmer convention
        dl = self.depth(l) + 1
        return (2.0 * dl) / ((self.depth(a) + 1) + (self.depth(b) + 1))

    def similarity_df(self, spark: SparkSession, pairs: List[Tuple[str, str]]) -> DataFrame:
        rows = []
        for a, b in pairs:
            rows.append(
                (a, b, self.path_sim(a, b), self.lch_sim(a, b), self.wup_sim(a, b))
            )
        return spark.createDataFrame(
            rows, "a string, b string, path_sim double, lch_sim double, wup_sim double"
        )


    # --------- path / explain / search (Similarities.java procedures)
    def path(self, a: str, b: str) -> Optional[List[str]]:
        """n10s.sim.pathsim.path analogue (shortestPathQuery,
        Similarities.java:29-33): the actual node path a → LCA → b, or
        None when the two nodes share no ancestor."""
        l = self.lca(a, b)
        if l is None:
            return None
        up = []
        cur = a
        while cur != l:
            up.append(cur)
            cur = self.parent[cur]
        down = []
        cur = b
        while cur != l:
            down.append(cur)
            cur = self.parent[cur]
        return up + [l] + list(reversed(down))

    def explain(self, a: str, b: str) -> Optional[dict]:
        """n10s.sim.pathsim.explain analogue: the path plus the numbers
        the similarity is computed from."""
        p = self.path(a, b)
        if p is None:
            return None
        return {
            "path": p,
            "lca": self.lca(a, b),
            "path_length": len(p) - 1,
            "depth_a": self.depth(a),
            "depth_b": self.depth(b),
            "max_depth": self.max_depth,
            "path_sim": self.path_sim(a, b),
            "lch_sim": self.lch_sim(a, b),
            "wup_sim": self.wup_sim(a, b),
        }

    def search(
        self,
        spark: SparkSession,
        node: str,
        measure: str = "path",
        threshold_length: Optional[int] = None,
    ) -> DataFrame:
        """n10s.sim.pathsim.search / lchsim.search analogue
        (shortestPathSearch, Similarities.java:41-44): every other
        taxonomy node within `threshold_length` hops with its similarity,
        ordered most-similar first. The taxonomy is driver-resident
        metadata (same split as the reference's Cypher over the class
        tree); the result is a DataFrame so callers can broadcast-join it
        against billion-row fact tables."""
        fn = {"path": self.path_sim, "lch": self.lch_sim, "wup": self.wup_sim}[measure]
        rows = []
        for other in sorted(self.nodes):
            if other == node:
                continue
            p = self.path_length(node, other)
            if p is None or (threshold_length is not None and p > threshold_length):
                continue
            rows.append((other, float(fn(node, other))))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return spark.createDataFrame(rows or [("", 0.0)], "node string, sim double").filter(
            F.col("node") != ""
        )
