"""Demo/verification driver: src_files → triples via the public API.

Run:  spark-submit --py-files <zip> examples/extract_demo.py
  or: python examples/extract_demo.py
"""

from neosemantics_spark.session import get_spark
from neosemantics_spark.sources.datagen import fixture_corpus, src_files_from_documents
from neosemantics_spark.sources.parse import extract_triples


def main() -> None:
    spark = get_spark("extract-demo", cpus=8)
    src = fixture_corpus(spark)
    triples = extract_triples(src, abort_on_error=False)
    triples.cache()
    n = triples.count()
    errs = triples.filter("parse_error is not null").count()
    print(f"[demo] fixture corpus: {n} rows, {errs} quarantined parse errors")
    triples.orderBy("path", "stmt_idx").show(12, truncate=60)
    docs = src_files_from_documents(spark, "/root/testdata/sf0.001", "Turtle")
    t2 = extract_triples(docs)
    print(f"[demo] documents-derived turtle corpus: {t2.count()} triples from {docs.count()} files")
    t2.groupBy("predicate").count().orderBy("predicate").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
