package graft.queries
import graft.GraftQuery
object Cdc { val all: Seq[GraftQuery] = Seq() }
