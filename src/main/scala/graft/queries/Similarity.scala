package graft.queries
import graft.GraftQuery
object Similarity { val all: Seq[GraftQuery] = Seq() }
