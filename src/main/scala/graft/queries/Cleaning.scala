package graft.queries
import graft.GraftQuery
object Cleaning { val all: Seq[GraftQuery] = Seq() }
