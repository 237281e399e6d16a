package graft.queries
import graft.GraftQuery
object Dedup { val all: Seq[GraftQuery] = Seq() }
