package graft.operators

import graft.QueryDef

/** Text-analysis + dedup operators over `documents` (filled in wave 3). */
object TextQueries {
  val all: Seq[QueryDef] = Seq.empty
}
