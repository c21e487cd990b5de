package graft.operators

import graft.QueryDef

/** Flight-pipeline parity queries (reference answers.py, wave 2). */
object FlightQueries {
  val all: Seq[QueryDef] = Seq.empty
}
