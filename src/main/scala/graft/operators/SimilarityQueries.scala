package graft.operators

import graft.QueryDef

/** Embedding similarity-search operators over `embeddings` (wave 3). */
object SimilarityQueries {
  val all: Seq[QueryDef] = Seq.empty
}
