package graft

/** All registered engine queries, one per SURVEY.md §2 operator (plus the
  * training-data-pipeline extensions). SparkEntry derives its `queries` /
  * `oracleSql` maps from this list.
  */
object Registry {
  def all: Seq[Q] =
    queries.Relational.all ++
      queries.TextPipeline.all ++
      queries.Embeddings.all ++
      queries.MultimodalQ.all ++
      queries.Graphs.all ++
      queries.Domain.all ++
      queries.StreamingQ.all
}
