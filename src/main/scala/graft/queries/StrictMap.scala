package graft.queries

/** Map builder that REJECTS duplicate keys at construction time.
  *
  * Scala `Map(...)` literals silently keep the last entry for a repeated
  * key, which once left a 44-line dead oracle-SQL literal shadowed in this
  * package. Declared-query and oracle maps are built through this instead,
  * so a duplicate key fails the first test (or Verify run) that touches it.
  */
object StrictMap {
  def apply[V](entries: (String, V)*): Map[String, V] = {
    val dups = entries.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty, s"duplicate query-map keys: ${dups.mkString(", ")}")
    entries.toMap
  }

  /** Merge maps that must not share keys (e.g. relational ++ extensions). */
  def disjointUnion[V](maps: Map[String, V]*): Map[String, V] = {
    val all = maps.flatMap(_.toSeq)
    apply(all: _*)
  }
}
