"""Connected-components skew evidence at 10M+ edges (VERDICT r1 item 10).

Synthetic worst-case sameAs graph, generated JVM-side (spark.range, no
driver data):
- one 10^6-member hub component: edges (m_i, hub) — 'hub' is a maximally
  hot key; the min-aggregation must absorb it map-side (partial agg)
  instead of melting one reducer
- long chains (default 1000 chains x 10k nodes ≈ 10^7 edges) — the
  worst case for ROUNDS: naive label propagation needs O(length) rounds;
  star contraction + pointer jumping must converge in ~log2(length)

Reports rounds, per-round contracted-edge counts and wall time, total
cluster-wide shuffle read/write bytes (from the Spark REST API), and
verifies correctness (component count + sizes). No driver-side collect
anywhere in the loop (connected_components is pure DataFrame ops +
localCheckpoint).

Usage: python scripts/cc_skew_bench.py [star_members] [n_chains] [chain_len]
Defaults: 1_000_000 1000 10_000  (-> 11M edges)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

STAR = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NCHAINS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
CLEN = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
CPUS = 32


def shuffle_totals(ui_url: str) -> dict:
    """Total shuffle read/write bytes across completed stages via the
    REST API (the same numbers the Spark UI shows)."""
    try:
        apps = json.load(urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui_url}/api/v1/applications/{app_id}/stages", timeout=10)
        )
        return {
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
            ),
        }
    except Exception as e:  # noqa: BLE001
        return {"shuffle_probe_error": str(e)[:200]}


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from neosemantics_spark.operators.cc import connected_components

    spark = (
        SparkSession.builder.appName("cc-skew")
        .master(f"local[{CPUS}]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST API for shuffle bytes
        .config("spark.ui.port", "0")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    # hub star: maximal key skew (10^6 edges all sharing endpoint 'hub')
    star = spark.range(0, STAR, 1, CPUS * 2).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("a"),
        F.lit("hub").alias("b"),
    )
    # long chains: c<chain>_<pos> -- c<chain>_<pos+1>
    chains = (
        spark.range(0, NCHAINS * CLEN, 1, CPUS * 2)
        .select((F.col("id") / CLEN).cast("long").alias("ch"), (F.col("id") % CLEN).alias("pos"))
        .filter(F.col("pos") < CLEN - 1)
        .select(
            F.concat(F.lit("c"), F.col("ch"), F.lit("_"), F.format_string("%06d", F.col("pos"))).alias("a"),
            F.concat(F.lit("c"), F.col("ch"), F.lit("_"), F.format_string("%06d", F.col("pos") + 1)).alias("b"),
        )
    )
    edges = star.unionByName(chains).localCheckpoint(eager=True)
    n_edges = edges.count()

    rounds: list[dict] = []

    def on_round(i: int, contracted: int, sec: float) -> None:
        rounds.append({"round": i, "contracted_edges": contracted, "sec": sec})
        print(f"[round {i}] contracted_edges={contracted} sec={sec}", flush=True)

    t0 = time.perf_counter()
    comp = connected_components(edges, max_iter=40, on_round=on_round)
    sizes = (
        comp.groupBy("component").count().agg(
            F.count("*").alias("n_components"),
            F.max("count").alias("max_size"),
            F.sum("count").alias("n_nodes"),
        ).first()
    )
    wall = round(time.perf_counter() - t0, 2)
    shuf = shuffle_totals(ui)

    expected_components = 1 + NCHAINS
    expected_nodes = STAR + 1 + NCHAINS * CLEN
    result = {
        "edges": n_edges,
        "star_members": STAR,
        "n_chains": NCHAINS,
        "chain_len": CLEN,
        "wall_sec": wall,
        "rounds": len(rounds),
        "per_round": rounds,
        "components": sizes["n_components"],
        "max_component": sizes["max_size"],
        "nodes": sizes["n_nodes"],
        "correct": bool(
            sizes["n_components"] == expected_components
            and sizes["max_size"] == STAR + 1
            and sizes["n_nodes"] == expected_nodes
        ),
        **shuf,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
