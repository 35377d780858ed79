"""PySpark-native analytics engine with the query/data-processing
capabilities of JMarzec/Transcriptomics-data-integration (reference at
/root/reference, read-only).

The reference is a batch R/Perl pipeline over tab-separated gene x sample
matrices (reference README.md:5).  This package re-expresses its dataflow
semantics Spark-first:

- canonical relation: long-format ``(gene_id, sample_id, value)`` DataFrame
  (SURVEY.md section 1.1) instead of in-RAM wide matrices;
- every reference script becomes a composable ``DataFrame -> DataFrame``
  function (operators/, stats/, pipelines/);
- statistical kernels use built-in SQL expressions where closed-form
  (quantile norm, BH, Stouffer, FEM/REM, pooled t) and Arrow-vectorized
  ``applyInPandas`` only where genuinely iterative (ComBat nonparametric
  prior, general limma designs);
- large-scale training-data ops (dedup, similarity search, text analysis,
  multimodal plumbing) live in llmdata/.
"""

__version__ = "0.1.0"
