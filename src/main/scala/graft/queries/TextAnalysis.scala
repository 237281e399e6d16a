package graft.queries
import graft.GraftQuery
object TextAnalysis { val all: Seq[GraftQuery] = Seq() }
