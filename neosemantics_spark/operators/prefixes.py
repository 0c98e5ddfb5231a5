"""Deterministic namespace→prefix assignment (the `_NsPrefDef` analogue).

The reference stores prefixes on a singleton node and generates `ns0, ns1…`
in statement-arrival order with a write-lock for concurrent importers
(/root/reference/src/main/java/n10s/utils/NsPrefixMap.java:94-113,214-246).
Arrival order is not reproducible on a distributed engine, so we assign
generated prefixes by SORTED ORDER over the distinct namespaces present in
the data: one distributed `distinct` aggregation, then a driver-side sort
of the (tiny, metadata-sized) namespace set — no coordination, stable
run-to-run (SURVEY.md §4 "deterministic prefix resolution").
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import STANDARD_PREFIXES

# rdf4j-style local-name boundary: last '#' or '/'
NS_SPLIT_RE = r"^(.*[#/])([^#/]*)$"


def namespace_of(col):
    return F.regexp_extract(col, NS_SPLIT_RE, 1)


def local_name_of(col):
    return F.regexp_extract(col, NS_SPLIT_RE, 2)


def collect_namespaces(triples: DataFrame) -> List[str]:
    """Distinct namespaces of predicates + rdf:type objects + datatypes —
    the set the reference learns during import. Distributed agg, tiny result."""
    preds = triples.select(namespace_of("predicate").alias("ns"))
    dts = triples.filter(F.col("datatype").isNotNull()).select(
        namespace_of("datatype").alias("ns")
    )
    types = triples.filter(
        (F.col("predicate") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        & ~F.col("is_literal")
    ).select(namespace_of("object").alias("ns"))
    rows = (
        preds.unionByName(dts)
        .unionByName(types)
        .filter(F.col("ns") != "")
        .distinct()
        .collect()
    )
    return sorted(r["ns"] for r in rows)


def build_prefix_map(namespaces: List[str], extra: Optional[Dict[str, str]] = None) -> Dict[str, str]:
    """namespace → prefix. Standard namespaces keep their well-known
    prefixes (NsPrefixMap.java:16-30); the rest get ns0, ns1… in sorted
    namespace order."""
    ns_to_prefix: Dict[str, str] = {v: k for k, v in STANDARD_PREFIXES.items()}
    if extra:
        for pfx, ns in extra.items():
            ns_to_prefix[ns] = pfx
    i = 0
    for ns in sorted(set(namespaces)):
        if ns not in ns_to_prefix:
            ns_to_prefix[ns] = f"ns{i}"
            i += 1
    return ns_to_prefix


def validate_namespaces(triples: DataFrame, ns_to_prefix: Dict[str, str]) -> None:
    """SHORTEN_STRICT: any namespace in use but absent from the prefix map
    raises (NsPrefixMap.java:109-112 throws on undefined prefixes)."""
    unknown = [ns for ns in collect_namespaces(triples) if ns not in ns_to_prefix]
    if unknown:
        raise ValueError(
            f"SHORTEN_STRICT: undefined namespace prefixes for {sorted(unknown)[:10]}"
        )


def shorten_expr(col, ns_to_prefix: Dict[str, str], strict: bool = False):
    """IRI column → 'prefix__local'. Implemented as a chained `F.when` over
    the broadcast-sized prefix dict (compiles to JVM-side expressions, stays
    inside whole-stage codegen — no Python). Unknown namespace: keep full
    IRI (strict mode raises at plan-build time via validate_namespaces)."""
    ns = namespace_of(col)
    local = local_name_of(col)
    expr = col  # fallback: full IRI untouched (e.g. no '#'/'/' split)
    # Longest namespaces first so nested namespaces match correctly.
    for namespace in sorted(ns_to_prefix, key=len, reverse=True):
        pfx = ns_to_prefix[namespace]
        expr = F.when(ns == namespace, F.concat(F.lit(pfx + "__"), local)).otherwise(expr)
    return expr


def expand_expr(col, ns_to_prefix: Dict[str, str]):
    """'prefix__local' → full IRI (fullUriFromShortForm,
    rdf/RDFProcedures.java:349-381)."""
    pfx = F.regexp_extract(col, r"^([^_]+(?:_[^_]+)*?)__(.*)$", 1)
    local = F.regexp_extract(col, r"^([^_]+(?:_[^_]+)*?)__(.*)$", 2)
    expr = col
    for namespace, prefix in sorted(ns_to_prefix.items(), key=lambda kv: kv[1]):
        expr = F.when(pfx == prefix, F.concat(F.lit(namespace), local)).otherwise(expr)
    return expr
