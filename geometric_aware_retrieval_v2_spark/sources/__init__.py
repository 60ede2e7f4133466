from geometric_aware_retrieval_v2_spark.sources.tables import load_table, docs_from_documents
from geometric_aware_retrieval_v2_spark.sources.corpus import synth_corpus_files, corpus_to_docs

__all__ = ["load_table", "docs_from_documents", "synth_corpus_files", "corpus_to_docs"]
