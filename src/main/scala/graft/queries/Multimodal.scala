package graft.queries
import graft.GraftQuery
object Multimodal { val all: Seq[GraftQuery] = Seq() }
