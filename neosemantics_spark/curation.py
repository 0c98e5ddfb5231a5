"""End-to-end corpus curation pipeline — the dataset-build loop a
training run executes over raw documents:

    exact dedup → near-dup clustering (keep one doc per cluster)
    → benchmark decontamination → LM quality filter → hash split

Each stage is one of the engine's first-class operators
(operators/dedup.py, operators/datasets.py, operators/lm.py); this
module only composes them and accounts for what each stage dropped.
`jobs/curate_job.py` is the spark-submit wrapper.

Scale notes: every stage is a pure DataFrame program (hash-groupBys,
bucketed candidate joins, the skew-hardened CC operator, broadcast
decontamination, n-gram-keyed LM joins, a narrow split expression).
The only driver scalars are the stage counters and the LM score
quantile cutoff (approxQuantile — a fixed-size sketch, not a collect).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import datasets, dedup, lm, similarity


class CurationResult(NamedTuple):
    curated: DataFrame  # input columns + cluster_id, avg_logp, split
    metrics: dict


def _apply_chunk_dedup(
    docs: DataFrame,
    metrics: dict,
    *,
    chunk_tokens: int,
    id_col: str,
    text_col: str,
    claimed: DataFrame | None = None,
) -> DataFrame:
    """Chunk-level dedup stage shared by the one-shot and incremental
    pipelines: rewrite each survivor without corpus-duplicated chunk
    spans (cross-batch when `claimed` is the persisted chunk-hash
    state), drop documents emptied to pure boilerplate, account both."""
    cd = dedup.dedup_chunks(
        docs,
        chunk_tokens=chunk_tokens,
        id_col=id_col,
        text_col=text_col,
        claimed=claimed,
    )
    out = docs.drop(text_col).join(
        cd.select(
            id_col, F.col("text_deduped").alias(text_col), "n_chunks_dropped"
        ),
        id_col,
    )
    agg = out.agg(
        F.sum("n_chunks_dropped").alias("d"),
        F.sum(F.when(F.length(text_col) == 0, 1).otherwise(0)).alias("e"),
    ).first()
    metrics["chunks_dropped"] = int(agg["d"] or 0)
    metrics["n_emptied_dropped"] = int(agg["e"] or 0)
    out = out.filter(F.length(F.col(text_col)) > 0).drop("n_chunks_dropped").cache()
    metrics["n_after_chunk_dedup"] = out.count()
    return out


def _apply_semantic_decontam(
    docs: DataFrame,
    metrics: dict,
    *,
    semantic_bench: DataFrame,
    embeddings: DataFrame | None,
    threshold: float,
    id_col: str,
) -> DataFrame:
    """Embedding-space decontamination stage (LSH-prefiltered — no cross
    join at any scale): drop survivors whose embedding sits within
    cosine `threshold` of any benchmark vector. `embeddings` maps the
    corpus id to an `embedding` vector; `semantic_bench` carries the
    same (id_col, embedding) schema for the eval set."""
    if embeddings is None:
        raise ValueError(
            "semantic decontamination requires an embeddings DataFrame "
            f"({id_col}, embedding) covering the corpus"
        )
    vecs = embeddings.join(docs.select(id_col), id_col, "left_semi")
    flagged = similarity.semantic_decontaminate(
        vecs,
        semantic_bench,
        threshold=threshold,
        id_col=id_col,
        vec_col="embedding",
        prefilter="lsh",
    )
    out = docs.join(flagged.select(id_col), id_col, "left_anti").cache()
    metrics["n_after_semantic_decontam"] = out.count()
    return out


def _semantic_dedup_stage(
    survivors: DataFrame,
    metrics: dict,
    *,
    embeddings: DataFrame | None,
    threshold: float,
    nbits: int,
    bands: int,
    id_col: str,
    old_buckets: DataFrame | None = None,
    old_vecs: DataFrame | None = None,
    rep_scores: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Embedding-space (SemDeDup-style) dedup stage shared by the
    one-shot and incremental pipelines. In-batch: LSH-bucketed candidate
    pairs → exact cosine >= `threshold` → connected components → the
    min-id doc survives. Cross-batch (when the persisted `emb_buckets` /
    `emb_vecs` state is passed): a new doc within `threshold` of ANY
    historically accepted embedding is dropped outright and the
    historical doc stays canonical — the same append-only,
    no-chaining-through-dropped-docs policy as the text near-dup stage.

    Documents with no row in `embeddings` pass through as singletons
    (no evidence either way — mirroring the LM filter's null-score
    rule). Returns (surviving reps, batch bucket table, batch vector
    table); the caller appends the latter two (filtered to accepted
    ids) to the persisted state. Vectors are L2-normalized ONCE in the
    batch scan (and the emb_vecs state therefore stores UNIT vectors),
    so every cross-batch and in-batch pair score is a single dot
    product — never a per-pair norm recomputation."""
    from .operators.similarity import dot_product, unit_vectors
    from .utils import round4

    if embeddings is None:
        raise ValueError(
            "semantic dedup requires an embeddings DataFrame "
            f"({id_col}, embedding) covering the corpus"
        )
    vecs = (
        unit_vectors(
            embeddings.join(survivors.select(id_col), id_col, "left_semi"),
            id_col,
            "embedding",
        )
        .select(F.col("id").alias(id_col), F.col("v").alias("embedding"))
        .localCheckpoint(eager=True)  # referenced by cross-score, pair
        # score, and the state append — narrow (id, vector) rows
    )
    eb = similarity.lsh_bucket_table(
        vecs, nbits, bands, id_col, "embedding"
    ).localCheckpoint(eager=True)
    if old_buckets is not None and old_vecs is not None:
        cand = (
            eb.select("band", "bucket", F.col("id").alias("new_id"))
            .join(
                old_buckets.select(
                    "band", "bucket", F.col("doc_id").alias("old_id")
                ),
                ["band", "bucket"],
            )
            .select("new_id", "old_id")
            .distinct()
        )
        sc = cand.join(
            vecs.select(F.col(id_col).alias("new_id"), F.col("embedding").alias("_nv")),
            "new_id",
        ).join(
            old_vecs.select(
                F.col("doc_id").alias("old_id"), F.col("embedding").alias("_ov")
            ),
            "old_id",
        )
        matched = (
            sc.filter(round4(dot_product(F.col("_nv"), F.col("_ov"))) >= threshold)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        survivors = survivors.join(matched, id_col, "left_anti")
    # in-batch pairs among the REMAINING survivors only: a history-
    # matched doc must not chain its in-batch neighbours away with it
    sids = survivors.select(F.col(id_col).alias("id"))
    sb = eb.join(sids, "id", "left_semi")
    pairs = (
        sb.select("band", "bucket", F.col("id").alias("a"))
        .join(sb.select("band", "bucket", F.col("id").alias("b")), ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    verified = (
        pairs.join(
            vecs.select(F.col(id_col).alias("a"), F.col("embedding").alias("_va")),
            "a",
        )
        .join(
            vecs.select(F.col(id_col).alias("b"), F.col("embedding").alias("_vb")),
            "b",
        )
        .filter(round4(dot_product(F.col("_va"), F.col("_vb"))) >= threshold)
        .select("a", "b")
    )
    clusters = dedup.near_dup_clusters(survivors.select(id_col), verified, id_col)
    if rep_scores is not None:
        winners = (
            dedup.elect_cluster_reps(clusters, rep_scores, id_col=id_col)
            .filter(F.col("is_rep") == 1)
            .select(id_col)
        )
    else:
        winners = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    reps = survivors.join(winners, id_col, "left_semi").cache()
    metrics["n_after_semantic_dedup"] = reps.count()
    return reps, eb, vecs


def _apply_nb_filter(
    docs: DataFrame,
    metrics: dict,
    *,
    nb_model,
    nb_keep_label: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Classifier-filter stage: score every survivor with a TRAINED NB
    model (`operators/classify.py` — in production a model fit on
    labeled quality/domain data, the fastText-classifier role) and keep
    only documents predicted as `nb_keep_label`. Deliberately takes a
    trained model, not labels: the curated corpus itself has no labels,
    and training inside the pipeline would make the filter drift with
    every batch — the same stable-reference argument as the persisted
    LM."""
    from .operators import classify

    scored = classify.nb_score(docs, nb_model, id_col=id_col, text_col=text_col)
    keep = scored.filter(F.col("predicted") == nb_keep_label).select(id_col)
    out = docs.join(keep, id_col, "left_semi").cache()
    metrics["n_after_nb_filter"] = out.count()
    return out


def _resolve_rep_scores(rep_score, docs, id_col, text_col):
    """Normalize the `rep_score` option to an (id_col, score) DataFrame
    (or None): the string "quality" computes the engine's text-quality
    composite over `docs`; a DataFrame passes through with its score
    column renamed. The scores table is rep-election input only — pure
    column expressions at corpus scale, no shuffle until the per-cluster
    argmin."""
    if rep_score is None:
        return None
    if isinstance(rep_score, str):
        if rep_score != "quality":
            raise ValueError(
                f"rep_score={rep_score!r}: expected 'quality' or an "
                f"({id_col}, score) DataFrame"
            )
        from .operators.text import quality_features

        return quality_features(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        ).select(
            F.col("doc_id").alias(id_col), F.col("quality_score").alias("score")
        )
    if "score" not in rep_score.columns:
        raise ValueError("rep_score DataFrame needs a 'score' column")
    return rep_score.select(id_col, "score")


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    decontam_n: int = 8,
    lm_quantile: float = 0.05,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_dedup: bool = False,
    chunk_tokens: int = 32,
    semantic_bench: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    semantic_dedup_threshold: float | None = None,
    semantic_nbits: int = 4,
    semantic_bands: int = 2,
    nb_model=None,
    nb_keep_label: str | None = None,
    rep_score=None,
) -> CurationResult:
    """Run the full curation pipeline over `docs`.

    - near-dups: MinHash-LSH candidates, exact-Jaccard verification at
      `jaccard_threshold`, transitive clustering; the cluster's min-id
      doc survives. With `rep_score` the HIGHEST-scoring cluster member
      survives instead (ties → min id; `dedup.elect_cluster_reps`):
      pass the string "quality" to score with the engine's
      text-quality composite (`text.quality_features.quality_score`),
      or any (id_col, score) DataFrame — an lm_score, nb_score, or
      external signal. The same election applies to the semantic-dedup
      stage's clusters when that stage is enabled.
    - chunk dedup (when `chunk_dedup`): survivors are rewritten without
      corpus-duplicated `chunk_tokens`-token spans (dedup.dedup_chunks);
      documents emptied to pure boilerplate are dropped.
    - semantic dedup (when `semantic_dedup_threshold` given, requires
      `embeddings`): SemDeDup-style embedding-space near-dup clustering
      at the given cosine threshold; one doc per cluster survives.
    - decontamination (when `bench` given): any doc sharing a
      `decontam_n`-gram with the benchmark set is dropped.
    - semantic decontamination (when `semantic_bench` given, requires
      `embeddings` (id_col, embedding)): docs within cosine
      `semantic_threshold` of any benchmark embedding are dropped
      (LSH-prefiltered — the scale path).
    - LM filter: a bigram LM is trained on the surviving corpus itself
      and the bottom `lm_quantile` of docs by mean log-prob is dropped
      (self-trained perplexity filtering; gibberish scores far below the
      bulk). Docs too short to have bigrams are kept (no evidence either
      way) with a null score.
    - split: deterministic md5-prefix train/val/test assignment.
    """
    # the dedup/LSH operators key on 'doc_id'; normalize and rename back
    out_id = id_col
    if id_col != "doc_id":
        if "doc_id" in docs.columns:
            raise ValueError(f"docs has both a 'doc_id' column and id_col={id_col!r}")
        docs = docs.withColumnRenamed(id_col, "doc_id")
        id_col = "doc_id"
    metrics: dict = {"n_input": docs.count()}

    kept = dedup.dedup_exact(docs, text_col).cache()
    metrics["n_after_exact_dedup"] = kept.count()

    rep_scores = _resolve_rep_scores(rep_score, kept, id_col, text_col)

    cand = dedup.minhash_lsh_candidates(
        kept, num_hashes=num_hashes, bands=bands, text_col=text_col
    )
    verified = dedup.ngram_jaccard_pairs(
        kept, threshold=jaccard_threshold, text_col=text_col, candidates=cand
    ).select("a", "b")
    clusters = dedup.near_dup_clusters(kept, verified, id_col)
    if rep_scores is not None:
        winners = (
            dedup.elect_cluster_reps(clusters, rep_scores, id_col=id_col)
            .filter(F.col("is_rep") == 1)
            .select(id_col, "cluster_id")  # keep cluster_id like min-id path
        )
        reps = kept.join(winners, id_col).cache()
    else:
        reps = (
            kept.join(clusters, id_col)
            .filter(F.col(id_col) == F.col("cluster_id"))
            .cache()
        )
    metrics["n_after_near_dedup"] = reps.count()

    if chunk_dedup:
        reps = _apply_chunk_dedup(
            reps, metrics, chunk_tokens=chunk_tokens, id_col=id_col, text_col=text_col
        )

    if semantic_dedup_threshold is not None:
        reps, _, _ = _semantic_dedup_stage(
            reps,
            metrics,
            embeddings=embeddings,
            threshold=semantic_dedup_threshold,
            nbits=semantic_nbits,
            bands=semantic_bands,
            id_col=id_col,
            rep_scores=rep_scores,
        )

    clean = reps
    if bench is not None:
        contaminated = datasets.decontaminate(
            clean, bench, n=decontam_n, id_col=id_col, text_col=text_col
        )
        clean = clean.join(
            contaminated.select(id_col), id_col, "left_anti"
        ).cache()
        metrics["n_after_decontam"] = clean.count()

    if semantic_bench is not None:
        clean = _apply_semantic_decontam(
            clean,
            metrics,
            semantic_bench=semantic_bench,
            embeddings=embeddings,
            threshold=semantic_threshold,
            id_col=id_col,
        )

    if nb_model is not None:
        if nb_keep_label is None:
            raise ValueError("nb_model requires nb_keep_label")
        clean = _apply_nb_filter(
            clean,
            metrics,
            nb_model=nb_model,
            nb_keep_label=nb_keep_label,
            id_col=id_col,
            text_col=text_col,
        )

    model = lm.train_bigram_lm(clean, id_col, text_col)
    scored = clean.join(
        lm.lm_score(clean, model, id_col=id_col, text_col=text_col).select(
            id_col, "avg_logp"
        ),
        id_col,
        "left",
    ).cache()
    if lm_quantile > 0:
        [cutoff] = scored.filter(F.col("avg_logp").isNotNull()).approxQuantile(
            "avg_logp", [lm_quantile], 0.001
        ) or [None]
        if cutoff is not None:
            scored = scored.filter(
                F.col("avg_logp").isNull() | (F.col("avg_logp") >= cutoff)
            )
        metrics["lm_cutoff"] = cutoff
    metrics["n_after_lm_filter"] = scored.count()

    curated = datasets.hash_split(scored, splits, id_col=id_col)
    metrics["split_counts"] = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    if out_id != "doc_id":
        curated = curated.withColumnRenamed("doc_id", out_id)
    return CurationResult(curated, metrics)


# ------------------------------------------------------- incremental state
class CurationCheckpoint:
    """Resumable batch-over-batch corpus curation — the dataset-build
    twin of `checkpoint.ImportCheckpoint` (same north-rule story: a
    100 TB corpus is built incrementally, and every batch must dedup /
    decontaminate against EVERYTHING already accepted, not just itself).

    Persisted state under `root` (parquet directories; Iceberg tables on
    a real cluster, the dataflow is identical):

    - `text_hashes`  (text_hash)           — sha2(text) of every document
      ever seen: cross-batch EXACT dedup is one anti-join on a 64-byte
      key. Includes dropped docs, so a re-submitted copy of a rejected
      document is rejected again without rescoring.
    - `reps`         (doc_id, text)        — the accepted canonical
      documents. The text rides along because cross-batch near-dup
      verification (exact Jaccard) needs it; at scale this is the
      curated corpus itself, stored once.
    - `buckets`      (doc_id, band, bucket) — MinHash-LSH bucket table of
      the accepted reps. A new batch's buckets equi-join against it, so
      cross-batch candidate generation never rescans or re-hashes the
      historical corpus — the state IS the index.
    - `emb_buckets` (doc_id, band, bucket) / `emb_vecs` (doc_id,
      embedding) — the embedding-space twin of buckets/reps (present
      when semantic dedup is enabled): the hyperplane-LSH bucket index
      and double-cast vectors of every accepted doc, so a new batch's
      embedding-space dedup against all of history is a (band, bucket)
      equi-join + exact-cosine verify, never a rescan.
    - `lm_bigrams` / `lm_unigrams` — the persisted bigram LM (trained on
      the first batch's survivors, reusable so later batches are scored
      against a STABLE reference distribution); its vocab size is stored
      in `meta.json` so later batches pay no extra count() job.
    - `meta.json`    — curation parameter fingerprint (+ LM vocab size);
      a state directory is refused under different parameters (a changed
      shingle size or band count silently invalidates the bucket index
      otherwise).

    Crash safety — batch-scoped snapshot commits (the plain-parquet
    analogue of an Iceberg transaction): each state table is a
    directory of `batch=<fingerprint>` subdirectories, and readers scan
    exactly the batch set listed in the manifest that `commits/HEAD`
    points at. A batch's appends go to its own subdirectories
    (mode=overwrite, so a replay cleanly replaces a partial write);
    only after hashes, reps, and buckets have all been written is a new
    manifest published and HEAD swapped by ONE atomic rename. A crash
    anywhere mid-batch leaves the previous snapshot fully live — the
    replayed batch sees none of its own partial output (same
    fingerprint → same subdirs → overwritten), recomputes, and commits
    once. This removes the partial-append window where a batch's hashes
    landed but its reps/buckets did not, which would have silently
    dropped the batch's accepted docs from all future state joins. The
    batch fingerprint is derived from the batch's distinct text-hash
    set (order-independent bit_xor + count), so it is deterministic
    across replays and engines. `compact()` merges the accumulated
    batch directories back into one (HEAD swap again) so state reads
    never list unboundedly many directories on a long-running build.
    Single writer per state root (one Spark driver — the same contract
    as a stream checkpoint).

    Near-dup policy (deliberate): a new doc matching ANY historical rep
    is dropped and the historical doc stays canonical — accepted docs
    are never retroactively displaced, so the curated output is
    append-only. Transitivity does not chain through dropped docs
    across batches (if A was dropped for matching rep R, a later doc B
    near-dup of A but not of R survives) — the alternative requires
    keeping every rejected doc's signature forever; at threshold 0.8
    the triangle gap is small and the append-only property is worth
    more.
    """

    def __init__(self, spark, root: str):
        import os
        import re

        # The commit protocol (manifest read/publish, HEAD rename,
        # compaction cleanup) runs through driver-local POSIX APIs while
        # the data tables go through Spark writers. On a non-local root
        # (hdfs://, s3a://, ...) the parquet writes would succeed but
        # _read_manifest would see nothing — ALL historical state
        # silently invisible and duplicates re-accepted. Refuse loudly
        # instead: the state root must be a driver-visible local path
        # (file:/ is accepted and normalized, since Spark and POSIX
        # agree on it).
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):", root)
        if m:
            scheme = m.group(1)
            if scheme != "file":
                raise ValueError(
                    f"CurationCheckpoint state root {root!r} uses URI scheme "
                    f"{scheme!r}, but the snapshot-commit protocol is "
                    f"driver-local (POSIX manifest + atomic HEAD rename). "
                    f"Use a local filesystem path, or mount the remote "
                    f"store and pass its mount point."
                )
            root = re.sub(r"^file:(//)?", "", root) or "/"
        self.spark = spark
        self.root = root
        self.p_hashes = os.path.join(root, "text_hashes")
        self.p_reps = os.path.join(root, "reps")
        self.p_buckets = os.path.join(root, "buckets")
        self.p_chunks = os.path.join(root, "chunk_hashes")
        self.p_emb_buckets = os.path.join(root, "emb_buckets")
        self.p_emb_vecs = os.path.join(root, "emb_vecs")
        self.p_lm_big = os.path.join(root, "lm_bigrams")
        self.p_lm_uni = os.path.join(root, "lm_unigrams")
        self.p_meta = os.path.join(root, "meta.json")
        self.p_commits = os.path.join(root, "commits")

    def _committed(self) -> list[str]:
        """Active batch ids = the list in the manifest HEAD points at.
        The snapshot-pointer layout (commits/MANIFEST-<seq>.json + a
        HEAD file swapped by atomic rename — the plain-filesystem
        analogue of an Iceberg snapshot pointer) makes BOTH the
        per-batch commit and whole-state compaction single atomic
        operations: a crash anywhere leaves HEAD on a complete older
        manifest. Single writer assumed (one Spark driver owns a state
        root — the same contract as the stream checkpoint)."""
        return list(self._read_manifest()["batches"])

    def _table(self, path: str) -> DataFrame | None:
        """Read a state table's COMMITTED batch subdirectories only — an
        uncommitted (crashed-mid-batch) subdirectory is invisible, which
        is what makes the whole batch replayable."""
        import os

        parts = [
            os.path.join(path, f"batch={bid}")
            for bid in self._committed()
            if os.path.isdir(os.path.join(path, f"batch={bid}"))
        ]
        if not parts:
            return None
        return self.spark.read.parquet(*parts)

    def _batch_dir(self, path: str, batch_id: str) -> str:
        import os

        return os.path.join(path, f"batch={batch_id}")

    def _lm_tables(self) -> tuple[DataFrame | None, DataFrame | None]:
        """The LM tables are write-once (trained on the first batch's
        survivors), not batch-scoped: a crash between the LM write and
        the batch commit leaves a model trained on exactly the survivors
        the deterministic replay recomputes, so reusing it is safe."""

        import os

        def rd(path: str) -> DataFrame | None:
            # existence pre-check keeps Spark from logging a noisy
            # FileNotFoundException stack on first-batch runs (local /
            # HDFS paths; an object-store deployment would probe the
            # catalog instead)
            if not os.path.isdir(path):
                return None
            try:
                return self.spark.read.parquet(path)
            except Exception:  # noqa: BLE001 — not created yet
                return None

        return rd(self.p_lm_big), rd(self.p_lm_uni)

    def _next_seq(self) -> int:
        import os

        try:
            seqs = [
                int(f.split("-", 1)[1].split(".")[0])
                for f in os.listdir(self.p_commits)
                if f.startswith("MANIFEST-")
            ]
        except FileNotFoundError:
            seqs = []
        return (max(seqs) + 1) if seqs else 0

    def _read_manifest(self) -> dict:
        import json
        import os

        head = os.path.join(self.p_commits, "HEAD")
        try:
            with open(head) as fh:
                manifest = fh.read().strip()
            with open(os.path.join(self.p_commits, manifest)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"batches": [], "history": []}

    def _publish(self, batches: list[str], history: list[str]) -> None:
        """Write a new complete manifest and swap HEAD onto it with one
        atomic rename(2). On an object store this is one Iceberg
        snapshot commit instead. `batches` is the ACTIVE snapshot (what
        state reads scan); `history` is the append-only commit order of
        every curation batch ever published — compaction rewrites the
        former and preserves the latter."""
        import json
        import os

        os.makedirs(self.p_commits, exist_ok=True)
        name = f"MANIFEST-{self._next_seq()}.json"
        with open(os.path.join(self.p_commits, name), "w") as fh:
            json.dump({"batches": batches, "history": history}, fh)
        tmp = os.path.join(self.p_commits, ".HEAD.tmp")
        with open(tmp, "w") as fh:
            fh.write(name)
        os.rename(tmp, os.path.join(self.p_commits, "HEAD"))

    def _commit(self, batch_id: str, metrics: dict | None = None) -> None:
        """Atomically publish a batch: append its id to the active set
        and swap HEAD. A crash between the table writes and this point
        leaves the previous snapshot intact; a crash between manifest
        write and the rename orphans one manifest file (harmless). The
        batch's metrics are written as a ledger row BEFORE the swap, so
        every committed batch has an audit record (what it dropped at
        each stage — the curation twin of ImportCheckpoint's per-file
        lineage + per-run metrics tables); an uncommitted batch's
        ledger row is overwritten by its replay like its data dirs."""
        import json
        import os

        if metrics is not None:
            mdir = os.path.join(self.root, "metrics")
            os.makedirs(mdir, exist_ok=True)
            with open(os.path.join(mdir, f"{batch_id}.json"), "w") as fh:
                json.dump(metrics, fh)
        m = self._read_manifest()
        if batch_id not in m["batches"]:
            self._publish(
                m["batches"] + [batch_id], m.get("history", []) + [batch_id]
            )

    def history(self) -> list[tuple[str, dict]]:
        """[(batch_id, metrics)] for every COMMITTED batch, in commit
        order — the audit trail of the whole incremental build.
        Compaction does not erase it (metrics are history, not state)."""
        import json
        import os

        out = []
        for bid in self._read_manifest().get("history", []):
            p = os.path.join(self.root, "metrics", f"{bid}.json")
            if os.path.exists(p):
                with open(p) as fh:
                    out.append((bid, json.load(fh)))
        return out

    def compact(self) -> int:
        """Merge all committed batch directories of each state table
        into ONE, and point HEAD at the compacted snapshot.

        An incremental build accumulates a batch=<id> subdirectory per
        table per batch; every later batch's state reads then list and
        scan N directories. Compaction bounds that at 1 again — the
        plain-parquet analogue of Iceberg's rewrite_data_files. The swap
        is a single HEAD rename, so a crash mid-compaction leaves the
        old snapshot fully live; the now-unreferenced batch directories
        are garbage-collected after the swap (crash mid-GC leaves
        unreferenced files only). Run it from the (single) writer
        between batches. Returns the number of batches merged."""
        import os
        import shutil

        active = self._committed()
        if len(active) <= 1:
            return len(active)
        cid = f"compact-{self._next_seq()}"
        tables = (
            self.p_hashes,
            self.p_reps,
            self.p_buckets,
            self.p_chunks,
            self.p_emb_buckets,
            self.p_emb_vecs,
        )
        for path in tables:
            merged = self._table(path)
            if merged is None:
                continue
            # localCheckpoint severs lineage from the directories being
            # replaced before anything is written under the same root
            merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                self._batch_dir(path, cid)
            )
        self._publish([cid], self._read_manifest().get("history", []))
        for path in tables:
            for bid in active:
                stale = self._batch_dir(path, bid)
                if os.path.isdir(stale):
                    shutil.rmtree(stale, ignore_errors=True)
        return len(active)

    def _read_meta(self) -> dict | None:
        import json
        import os

        if not os.path.exists(self.p_meta):
            return None
        with open(self.p_meta) as fh:
            return json.load(fh)

    def _write_meta(self, meta: dict) -> None:
        import json
        import os

        os.makedirs(self.root, exist_ok=True)
        tmp = self.p_meta + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.rename(tmp, self.p_meta)

    # defaults for params added after a state root may have been created;
    # absent keys in a stored meta.json mean "built before the knob
    # existed", i.e. the knob's default behavior — NOT a mismatch
    # (ADVICE r5: strict equality bricked pre-existing state roots).
    _PARAM_DEFAULTS = {
        "chunk_dedup": False,
        "chunk_tokens": 32,
        "semantic_dedup_threshold": None,
        "semantic_nbits": 4,
        "semantic_bands": 2,
    }

    def _check_meta(self, params: dict) -> dict:
        stored = self._read_meta()
        if stored is not None:
            stored_params = dict(stored.get("params") or {})
            migrated = False
            for key, default in self._PARAM_DEFAULTS.items():
                if key not in stored_params:
                    stored_params[key] = default
                    migrated = True
            if stored_params != params:
                raise ValueError(
                    f"Curation state at {self.root} was built with "
                    f"{stored_params}; refusing to extend it with "
                    f"{params} — the persisted bucket index and LM are "
                    "parameter-specific."
                )
            if migrated:  # persist the filled params so the file is current
                stored = {**stored, "params": stored_params}
                self._write_meta(stored)
            return stored
        meta = {"params": params, "lm_vocab_size": None}
        self._write_meta(meta)
        return meta

    def run(
        self,
        batch: DataFrame,
        bench: DataFrame | None = None,
        *,
        num_hashes: int = 8,
        bands: int = 4,
        jaccard_threshold: float = 0.8,
        decontam_n: int = 8,
        lm_quantile: float = 0.05,
        splits: dict[str, float] | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        chunk_dedup: bool = False,
        chunk_tokens: int = 32,
        semantic_bench: DataFrame | None = None,
        embeddings: DataFrame | None = None,
        semantic_threshold: float = 0.95,
        semantic_dedup_threshold: float | None = None,
        semantic_nbits: int = 4,
        semantic_bands: int = 2,
        nb_model=None,
        nb_keep_label: str | None = None,
        rep_score=None,
    ) -> CurationResult:
        """Curate one batch against all previously accepted state.
        doc ids must be globally unique across batches (they key the
        persisted rep/bucket tables).

        With `chunk_dedup`, chunk ownership is CROSS-BATCH: the state's
        chunk_hashes table claims every normalized chunk seen in any
        earlier batch's near-dedup survivors, so a later batch's copy of
        a historical boilerplate block is dropped even when the carrier
        documents are not near-dups. Ownership is seen-based like
        text_hashes (a chunk stays claimed even if its carrier doc is
        later filtered out — the alternative, claiming only accepted
        chunks, would re-chunk rewritten text at shifted boundaries).

        With `semantic_dedup_threshold`, embedding-space dedup is also
        CROSS-BATCH: the emb_buckets/emb_vecs state indexes every
        accepted doc's embedding, a new doc within the cosine threshold
        of ANY of them is dropped (historical doc stays canonical), and
        in-batch clustering applies the same no-chaining policy as the
        text near-dup stage.

        `rep_score` ("quality" or an (id_col, score) DataFrame) elects
        the highest-scoring member of each IN-BATCH cluster instead of
        the min id (`dedup.elect_cluster_reps`), for both the text and
        embedding near-dup stages. It is a batch-local selection policy,
        not part of the state fingerprint: the persisted index stays
        valid because it is derived from whatever set was actually
        accepted; cross-batch drops (historical doc stays canonical)
        are unaffected by which in-batch member won."""
        meta = self._check_meta(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "jaccard_threshold": jaccard_threshold,
                "decontam_n": decontam_n,
                "k_shingle": 3,
                "chunk_dedup": chunk_dedup,
                "chunk_tokens": chunk_tokens,
                "semantic_dedup_threshold": semantic_dedup_threshold,
                "semantic_nbits": semantic_nbits,
                "semantic_bands": semantic_bands,
            }
        )
        # normalize the id column: the dedup/LSH operators and the
        # persisted state tables key on 'doc_id' (a stable state schema
        # regardless of the caller's column name); rename back on return
        out_id = id_col
        if id_col != "doc_id":
            if "doc_id" in batch.columns:
                raise ValueError(
                    f"batch has both a 'doc_id' column and id_col={id_col!r}"
                )
            batch = batch.withColumnRenamed(id_col, "doc_id")
            id_col = "doc_id"

        metrics: dict = {"n_batch": batch.count()}

        # 1. exact dedup: in-batch, then against every hash ever seen
        kept = dedup.dedup_exact(batch, text_col)
        batch_hashes = batch.select(
            F.sha2(F.col(text_col), 256).alias("text_hash")
        ).distinct()
        # deterministic order-independent batch fingerprint: the commit
        # id under which this batch's state appends are published (a
        # replay of the same batch maps to the same subdirectories and
        # overwrites any uncommitted partial write)
        fp = batch_hashes.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(text_hash))").alias("x"),
        ).first()
        batch_id = f"{fp['n']}-{(fp['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
        metrics["batch_id"] = batch_id

        old_hashes = self._table(self.p_hashes)
        if old_hashes is not None:
            kept = kept.join(
                old_hashes.withColumnRenamed("text_hash", "_oh"),
                F.sha2(F.col(text_col), 256) == F.col("_oh"),
                "left_anti",
            )
            # only genuinely-new hashes are recorded for this batch —
            # resubmitted documents must not grow the state table
            batch_hashes = batch_hashes.join(old_hashes, "text_hash", "left_anti")
        fresh = kept.cache()
        metrics["n_fresh"] = fresh.count()
        if metrics["n_fresh"] == 0:
            # nothing new: n_fresh == 0 implies every batch text is
            # already in the hash store, so there is no state to append
            # either — short-circuit the whole downstream DAG
            metrics["n_after_near_dedup"] = 0
            metrics["n_accepted"] = 0
            metrics["split_counts"] = {}
            empty = batch.limit(0).withColumn(
                "avg_logp", F.lit(None).cast("double")
            )
            curated = datasets.hash_split(empty, splits, id_col=id_col)
            if out_id != "doc_id":
                curated = curated.withColumnRenamed("doc_id", out_id)
            return CurationResult(curated, metrics)

        # 2. near-dup: batch bucket table joins the persisted rep index
        new_b = dedup.lsh_buckets(
            dedup.minhash_signatures(fresh, num_hashes, 3, text_col), bands
        ).cache()
        old_b = self._table(self.p_buckets)
        old_reps = self._table(self.p_reps)
        cross = None
        if old_b is not None and old_reps is not None:
            cross = (
                new_b.select("band", "bucket", F.col("doc_id").alias("new_id"))
                .join(
                    old_b.select("band", "bucket", F.col("doc_id").alias("old_id")),
                    ["band", "bucket"],
                )
                .select("new_id", "old_id")
                .distinct()
            )
        in_batch = dedup.bucket_pairs(new_b, ["band", "bucket"], "doc_id")

        # one combined exact-Jaccard verification over both pair kinds
        pairs = in_batch.select("a", "b")
        verify_docs = fresh.select(id_col, text_col)
        if cross is not None:
            norm = cross.select(
                F.least("new_id", "old_id").alias("a"),
                F.greatest("new_id", "old_id").alias("b"),
            )
            pairs = pairs.unionByName(norm).distinct()
            involved_old = (
                cross.select(F.col("old_id").alias(id_col)).distinct()
            )
            verify_docs = verify_docs.unionByName(
                old_reps.join(involved_old, id_col, "left_semi").select(id_col, text_col)
            )
        verified = dedup.ngram_jaccard_pairs(
            verify_docs, threshold=jaccard_threshold, text_col=text_col,
            candidates=pairs,
        ).select("a", "b").cache()

        # new docs matching ANY historical rep are dropped outright (the
        # historical doc stays canonical); survivors cluster in-batch
        fresh_ids = fresh.select(id_col)
        matched_hist = None
        if cross is not None:
            # re-select (a, b) explicitly: the semi-joins move the join
            # key first (column order becomes (b, a)) and exceptAll
            # compares POSITIONALLY — without this, no pair ever
            # subtracts and every in-batch pair is misread as a
            # historical match (caught by the no-chaining test)
            hist_pairs = (
                verified.join(
                    fresh_ids.withColumnRenamed(id_col, "a"), "a", "left_semi"
                )
                .join(fresh_ids.withColumnRenamed(id_col, "b"), "b", "left_semi")
                .select("a", "b")
            )
            # a pair where BOTH sides are fresh is in-batch; others are cross
            in_batch_v = hist_pairs
            cross_v = verified.exceptAll(hist_pairs)
            matched_hist = (
                cross_v.select(F.col("a").alias(id_col))
                .unionByName(cross_v.select(F.col("b").alias(id_col)))
                .join(fresh_ids, id_col, "left_semi")
                .distinct()
            )
        else:
            in_batch_v = verified
        survivors = fresh
        if matched_hist is not None:
            survivors = survivors.join(matched_hist, id_col, "left_anti")
            # cluster SURVIVOR-survivor pairs only: a history-matched doc
            # must not carry its in-batch neighbors away with it — if it
            # were a cluster's min id, the cluster would keep NO
            # representative (docs dropped with nothing accepted standing
            # for them). This is the documented no-chaining-through-
            # dropped-docs policy applied in-batch.
            sids = survivors.select(id_col)
            in_batch_v = in_batch_v.join(
                sids.withColumnRenamed(id_col, "a"), "a", "left_semi"
            ).join(sids.withColumnRenamed(id_col, "b"), "b", "left_semi")
        clusters = dedup.near_dup_clusters(survivors, in_batch_v, id_col)
        rep_scores = _resolve_rep_scores(rep_score, fresh, id_col, text_col)
        if rep_scores is not None:
            winners = (
                dedup.elect_cluster_reps(clusters, rep_scores, id_col=id_col)
                .filter(F.col("is_rep") == 1)
                .select(id_col)
            )
            reps = survivors.join(winners, id_col, "left_semi").cache()
        else:
            reps = (
                survivors.join(clusters, id_col)
                .filter(F.col(id_col) == F.col("cluster_id"))
                .drop("cluster_id")
                .cache()
            )
        metrics["n_after_near_dedup"] = reps.count()

        # 2b. chunk-level dedup — cross-batch: chunks claimed by earlier
        # batches (persisted chunk_hashes state) are dropped for every
        # doc; in-batch first-doc-wins applies to unclaimed chunks only
        new_chunks = None
        if chunk_dedup:
            claimed = self._table(self.p_chunks)
            pre_chunk = reps
            reps = _apply_chunk_dedup(
                reps,
                metrics,
                chunk_tokens=chunk_tokens,
                id_col=id_col,
                text_col=text_col,
                claimed=claimed,
            )
            new_chunks = dedup.chunk_hash_table(
                pre_chunk, chunk_tokens=chunk_tokens, id_col=id_col, text_col=text_col
            )
            if claimed is not None:
                new_chunks = new_chunks.join(claimed, "ch", "left_anti")

        # 2c. embedding-space dedup — cross-batch: the persisted
        # emb_buckets/emb_vecs state indexes every accepted embedding
        new_eb = new_ev = None
        if semantic_dedup_threshold is not None:
            reps, new_eb, new_ev = _semantic_dedup_stage(
                reps,
                metrics,
                embeddings=embeddings,
                threshold=semantic_dedup_threshold,
                nbits=semantic_nbits,
                bands=semantic_bands,
                id_col=id_col,
                old_buckets=self._table(self.p_emb_buckets),
                old_vecs=self._table(self.p_emb_vecs),
                rep_scores=rep_scores,
            )

        # 3. decontamination (stateless vs the benchmark set)
        clean = reps
        if bench is not None:
            clean = clean.join(
                datasets.decontaminate(
                    clean, bench, n=decontam_n, id_col=id_col, text_col=text_col
                ).select(id_col),
                id_col,
                "left_anti",
            ).cache()
            metrics["n_after_decontam"] = clean.count()

        # 3b. semantic decontamination (stateless, LSH-prefiltered)
        if semantic_bench is not None:
            clean = _apply_semantic_decontam(
                clean,
                metrics,
                semantic_bench=semantic_bench,
                embeddings=embeddings,
                threshold=semantic_threshold,
                id_col=id_col,
            )

        # 3c. classifier filter (externally trained NB model — a stable
        # reference by construction, like the persisted LM)
        if nb_model is not None:
            if nb_keep_label is None:
                raise ValueError("nb_model requires nb_keep_label")
            clean = _apply_nb_filter(
                clean,
                metrics,
                nb_model=nb_model,
                nb_keep_label=nb_keep_label,
                id_col=id_col,
                text_col=text_col,
            )

        # 4. LM filter against the persisted reference model (trained on
        # the first batch's survivors; later batches score against the
        # same distribution instead of drifting with each batch). With
        # the filter DISABLED (lm_quantile == 0) and no model persisted
        # yet, skip training and scoring entirely — the rows pass
        # through with a null avg_logp, and the reference model will be
        # trained by the first batch that actually enables the filter
        # (note: that batch's survivors, not batch 1's, then define the
        # reference distribution).
        big, uni = self._lm_tables()
        if lm_quantile <= 0 and big is None and uni is None:
            # filter disabled and no reference model persisted: rows
            # pass through with a null score, nothing is trained
            scored = clean.withColumn("avg_logp", F.lit(None).cast("double"))
        else:
            if big is None or uni is None:
                model = lm.train_bigram_lm(clean, id_col, text_col)
                model.bigrams.write.mode("overwrite").parquet(self.p_lm_big)
                model.unigrams.write.mode("overwrite").parquet(self.p_lm_uni)
                # vocab size rides in meta.json so later batches skip the
                # count() job (the docstring's lm_meta — one scalar, no table)
                meta["lm_vocab_size"] = model.vocab_size
                self._write_meta(meta)
                model = lm.BigramLM(
                    self.spark.read.parquet(self.p_lm_big),
                    self.spark.read.parquet(self.p_lm_uni),
                    model.vocab_size,
                )
            else:
                vs = meta.get("lm_vocab_size")
                model = lm.BigramLM(big, uni, vs if vs is not None else uni.count())
            scored = clean.join(
                lm.lm_score(clean, model, id_col=id_col, text_col=text_col).select(
                    id_col, "avg_logp"
                ),
                id_col,
                "left",
            ).cache()
            if lm_quantile > 0:
                [cutoff] = scored.filter(
                    F.col("avg_logp").isNotNull()
                ).approxQuantile("avg_logp", [lm_quantile], 0.001) or [None]
                if cutoff is not None:
                    scored = scored.filter(
                        F.col("avg_logp").isNull() | (F.col("avg_logp") >= cutoff)
                    )
                metrics["lm_cutoff"] = cutoff
        # sever lineage BEFORE the state writes below: the accepted set's
        # plan anti-joins the committed text_hashes parquet, and writing
        # under the same state root must not lazily re-evaluate the
        # result DataFrame against refreshed file listings (observed —
        # Spark invalidates relation caches on a path when writing
        # through it)
        accepted = scored.localCheckpoint(eager=True)
        metrics["n_accepted"] = accepted.count()

        curated = datasets.hash_split(accepted, splits, id_col=id_col)
        metrics["split_counts"] = {
            r["split"]: r["n"]
            for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
        }

        # 5. publish state under this batch's fingerprint, then commit
        # atomically. Writes go to batch=<id> subdirectories invisible to
        # readers until the marker lands; overwrite mode makes a replay
        # of a crashed batch replace its own partial output instead of
        # duplicating it. Only after ALL three tables are written does
        # the commit marker make them visible at once — there is no
        # ordering window where hashes are live but reps/buckets are not.
        batch_hashes.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            self._batch_dir(self.p_hashes, batch_id)
        )
        accepted.select(id_col, text_col).write.mode("overwrite").parquet(
            self._batch_dir(self.p_reps, batch_id)
        )
        new_b.join(accepted.select(id_col), "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(self._batch_dir(self.p_buckets, batch_id))
        if new_chunks is not None:
            # sever lineage like batch_hashes: the plan anti-joins the
            # committed chunk state under the same root being written
            new_chunks.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                self._batch_dir(self.p_chunks, batch_id)
            )
        if new_eb is not None and new_ev is not None:
            # embedding index of the batch's ACCEPTED docs only (both
            # tables are localCheckpoint-pinned inside the stage, so the
            # writes cannot lazily re-read state under this root)
            acc_ids = accepted.select(F.col(id_col).alias("id"))
            new_eb.join(acc_ids, "id", "left_semi").select(
                F.col("id").alias("doc_id"), "band", "bucket"
            ).write.mode("overwrite").parquet(
                self._batch_dir(self.p_emb_buckets, batch_id)
            )
            new_ev.join(
                acc_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
            ).write.mode("overwrite").parquet(
                self._batch_dir(self.p_emb_vecs, batch_id)
            )
        self._commit(batch_id, metrics)
        if out_id != "doc_id":
            curated = curated.withColumnRenamed("doc_id", out_id)
        return CurationResult(curated, metrics)
