"""src_files → triples DataFrame: the vectorized multi-format RDF source.

Spark-first re-expression of the reference's format-dispatch parser source
(/root/reference/src/main/java/n10s/CommonProcedures.java:125-134, formats
:45-48) and quad processor
(/root/reference/src/main/java/n10s/quadrdf/RDFQuadToLPGStatementProcessor.java:49-95).

Input table (BASELINE.json input_hint):
    (repo string, path string, commit string, lang string, content string)

Output: the flat columnar triples table of SURVEY.md §1.6 —
    subject, predicate, object, is_literal, datatype, lang, graph,
    sspo array<string>, repo, path, commit, stmt_idx, parse_error

Design points (scale):
- `mapInPandas` — Arrow-batched; one Python call handles thousands of
  documents, no per-row UDF overhead. Parsing is embarrassingly parallel
  per file, so the plan is a single narrow stage over the source scan:
  no shuffle until the first groupBy downstream.
- Blank-node skolemization is done HERE, deterministically:
  `bnode://sha256(repo|path|commit|label)[:32]` — file-scoped so bnodes
  from different files never collide, and stable run-to-run (the
  reference's ids are parser-instance-scoped: RDFToLPGStatementProcessor.java:399).
- stmt_idx is the 0-based statement index in document order → the
  canonical total order (repo, path, commit, stmt_idx) that makes
  OVERWRITE/last-wins and prefix generation deterministic (SURVEY.md §4.3).
- Parse failures follow abortOnError=False semantics: the document yields
  one quarantine row with parse_error set (RDFParserConfig.java:44-45).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..rdf.jsonld import parse_jsonld
from ..rdf.rdfxml import parse_rdfxml
from ..rdf.terms import BNode, IRI, Literal, QuotedTriple, Statement, Term
from ..rdf.turtle import parse_ntriples, parse_turtle

TRIPLES_SCHEMA = StructType(
    [
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object", StringType()),
        StructField("is_literal", BooleanType()),
        StructField("datatype", StringType()),
        StructField("lang", StringType()),
        StructField("graph", StringType()),
        StructField("sspo", ArrayType(StringType())),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("stmt_idx", LongType()),
        StructField("parse_error", StringType()),
    ]
)

# canonical format names, mirroring CommonProcedures.java:45-48
_TURTLE_FAMILY = {"Turtle", "TriG", "Turtle-star", "TriG-star"}
_NT_FAMILY = {"N-Triples", "N-Quads"}

_EXT_FORMAT = {
    ".ttl": "Turtle",
    ".ttls": "Turtle-star",
    ".nt": "N-Triples",
    ".nq": "N-Quads",
    ".trig": "TriG",
    ".trigs": "TriG-star",
    ".json": "JSON-LD",
    ".jsonld": "JSON-LD",
    ".rdf": "RDF/XML",
    ".owl": "RDF/XML",
    ".xml": "RDF/XML",
}


def sniff_format(lang: Optional[str], path: str, content: str) -> str:
    if lang:
        return lang
    for ext, fmt in _EXT_FORMAT.items():
        if path.endswith(ext):
            return fmt
    head = content.lstrip()[:200]
    if head.startswith("{") or head.startswith("["):
        return "JSON-LD"
    if head.startswith("<?xml") or head.startswith("<rdf:RDF") or head.startswith("<RDF"):
        return "RDF/XML"
    if "@prefix" in head or "PREFIX" in head:
        return "Turtle"
    return "N-Triples"


def parse_document(fmt: str, content: str, base: Optional[str] = None) -> List[Statement]:
    if fmt in _NT_FAMILY:
        return parse_ntriples(content)
    if fmt in _TURTLE_FAMILY:
        return parse_turtle(content, base)
    if fmt == "JSON-LD":
        return parse_jsonld(content, base)
    if fmt == "RDF/XML":
        return parse_rdfxml(content, base)
    # unknown → try turtle family (superset of NT) then JSON/XML
    try:
        return parse_turtle(content, base)
    except Exception:
        pass
    try:
        return parse_jsonld(content, base)
    except Exception:
        return parse_rdfxml(content, base)


_TAR_GZ = (".tar.gz", ".tgz")
_TAR_BZ2 = (".tar.bz2", ".tbz2")


def _is_packed(path: str) -> bool:
    base = path.split("!", 1)[0]
    return base.endswith((".gz", ".bz2", ".zip", ".tgz", ".tbz2"))


def _expand_payload(path: str, content: str) -> List[tuple]:
    """Compressed/archive payload → [(logical_path, text), ...].

    Mirrors the reference's archive-entry URL forms
    (CommonProcedures.java:139-183; tested RDFProceduresTest.java:529-641):
      `a.zip!entry.ttl`, `a.tgz!entry.ttl` select ONE entry; a bare
      `a.zip` / `a.tar.gz` / `a.tar.bz2` expands EVERY regular entry
      (each becomes its own document with path `archive!entry`, so bnode
      skolemization and stmt_idx stay entry-scoped); bare `.gz` / `.bz2`
      are single-document streams. `content` is base64(bytes)."""
    import base64
    import bz2
    import gzip
    import io
    import tarfile
    import zipfile

    base, _, entry = path.partition("!")
    raw = base64.b64decode(content)
    if base.endswith(_TAR_GZ) or base.endswith(_TAR_BZ2):
        mode = "r:gz" if base.endswith(_TAR_GZ) else "r:bz2"
        with tarfile.open(fileobj=io.BytesIO(raw), mode=mode) as tf:
            if entry:
                f = tf.extractfile(tf.getmember(entry))
                if f is None:
                    raise ValueError(f"not a file entry: {entry}")
                return [(f"{base}!{entry}", f.read().decode("utf-8"))]
            return [
                (f"{base}!{m.name}", tf.extractfile(m).read().decode("utf-8"))
                for m in sorted(tf.getmembers(), key=lambda m: m.name)
                if m.isreg()
            ]
    if base.endswith(".zip"):
        with zipfile.ZipFile(io.BytesIO(raw)) as zf:
            names = (
                [entry]
                if entry
                else sorted(n for n in zf.namelist() if not n.endswith("/"))
            )
            return [(f"{base}!{n}", zf.read(n).decode("utf-8")) for n in names]
    if base.endswith(".gz"):
        return [(base[: -len(".gz")], gzip.decompress(raw).decode("utf-8"))]
    return [(base[: -len(".bz2")], bz2.decompress(raw).decode("utf-8"))]


def _skolem(repo: str, path: str, commit: str, label: str) -> str:
    h = hashlib.sha256(f"{repo}|{path}|{commit}|{label}".encode()).hexdigest()[:32]
    return "bnode://" + h


def _term_str(t: Term, repo: str, path: str, commit: str) -> str:
    if isinstance(t, IRI):
        return t.value
    if isinstance(t, BNode):
        return _skolem(repo, path, commit, t.value)
    if isinstance(t, Literal):
        return t.lexical
    if isinstance(t, QuotedTriple):
        return t.n3()
    return str(t)


def statements_to_rows(
    stmts: Iterable[Statement], repo: str, path: str, commit: str
) -> Iterator[dict]:
    idx = 0
    for st in stmts:
        s, p, o, g = st.s, st.p, st.o, st.g
        if isinstance(o, QuotedTriple) and not isinstance(s, QuotedTriple):
            # triple-as-object is ignored by the reference
            # (RDFToLPGStatementProcessor.java:449-450)
            continue
        sspo = None
        if isinstance(s, QuotedTriple):
            sspo = [
                _term_str(s.s, repo, path, commit),
                _term_str(s.p, repo, path, commit),
                _term_str(s.o, repo, path, commit),
            ]
            subject = None
        else:
            subject = _term_str(s, repo, path, commit)
        is_lit = isinstance(o, Literal)
        yield {
            "subject": subject,
            "predicate": _term_str(p, repo, path, commit),
            "object": _term_str(o, repo, path, commit),
            "is_literal": is_lit,
            "datatype": o.datatype if is_lit else None,
            "lang": o.lang if is_lit else None,
            "graph": g,
            "sspo": sspo,
            "repo": repo,
            "path": path,
            "commit": commit,
            "stmt_idx": idx,
            "parse_error": None,
        }
        idx += 1


_EMIT_ROWS = 64_000  # flush threshold: bounds worker memory + Arrow frame size


def _parse_batches(
    batches: Iterator[pd.DataFrame], abort_on_error: bool
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in TRIPLES_SCHEMA.fields]
    for pdf in batches:
        rows: List[dict] = []
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            if len(rows) >= _EMIT_ROWS:
                yield pd.DataFrame(rows, columns=cols)
                rows = []
            path = path or ""
            # S2 compressed/archive payloads (CommonProcedures.java:139-183):
            # *.gz/*.bz2/*.zip/*.tgz/*.tar.{gz,bz2} paths (optionally with a
            # `!entry` selector) carry base64(bytes) in `content`
            if _is_packed(path):
                try:
                    docs = _expand_payload(path, content or "")
                except Exception as e:  # noqa: BLE001 — corrupt archive
                    if abort_on_error:
                        raise
                    rows.append(
                        {
                            **{c: None for c in cols},
                            "repo": repo, "path": path, "commit": commit,
                            "stmt_idx": -1,
                            "parse_error": f"{type(e).__name__}: {e}"[:500],
                        }
                    )
                    continue
            else:
                docs = [(path, content or "")]
            for dpath, dcontent in docs:
                fmt = sniff_format(lang, dpath, dcontent)
                try:
                    stmts = parse_document(fmt, dcontent)
                    rows.extend(statements_to_rows(stmts, repo, dpath, commit))
                except Exception as e:  # noqa: BLE001 — quarantine path
                    if abort_on_error:
                        raise
                    rows.append(
                        {
                            **{c: None for c in cols},
                            "repo": repo,
                            "path": dpath,
                            "commit": commit,
                            "stmt_idx": -1,
                            "parse_error": f"{type(e).__name__}: {e}"[:500],
                        }
                    )
        yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
            {c: pd.Series(dtype=object) for c in cols}
        )


def extract_triples(
    src_files: DataFrame, abort_on_error: bool = False, min_partitions: int | None = None
) -> DataFrame:
    """src_files(repo,path,commit,lang,content) → triples DF.

    Normally a narrow (shuffle-free) stage: at 100 TB the source table's
    file splits drive parallelism. BUT parquet readers bin-pack small
    files up to maxPartitionBytes, so a small/medium corpus can collapse
    to a handful of input partitions and starve the CPU-bound Python parse
    (measured: 8→32 cores gave a 1.09× speedup before this fix). When the
    scan yields fewer partitions than the cluster's parallelism, pay one
    cheap shuffle of the raw bytes to fan the parse out; at real scale the
    condition is false and no shuffle happens.
    """
    cols = ["repo", "path", "commit", "lang", "content"]
    src = src_files.select(*cols)
    target = min_partitions
    n_in = None
    if target is None:
        try:
            target = src.sparkSession.sparkContext.defaultParallelism * 2
        except Exception:  # noqa: BLE001 — e.g. connect-only session
            target = None
    if target is not None:
        try:
            # .rdd is unavailable on Spark Connect — same guard as above
            n_in = src.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001
            n_in = None
    if target and n_in is not None and n_in < target:
        src = src.repartition(target)
    return src.mapInPandas(
        lambda it: _parse_batches(it, abort_on_error), schema=TRIPLES_SCHEMA
    )
