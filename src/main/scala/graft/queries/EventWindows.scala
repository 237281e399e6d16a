package graft.queries
import graft.GraftQuery
object EventWindows { val all: Seq[GraftQuery] = Seq() }
