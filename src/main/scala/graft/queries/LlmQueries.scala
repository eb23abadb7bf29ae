package graft.queries

/** Training-data pipeline operators over `documents`/`embeddings`
  * (dedup, similarity search, text analysis, multimodal plumbing).
  * Populated incrementally — see graft.llm.
  */
object LlmQueries {
  val all: Seq[Q] = Seq()
}
