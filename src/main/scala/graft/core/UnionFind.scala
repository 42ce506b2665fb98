package graft.core

/** Union-find with lexicographic-min canonical ids — shared by the oracle
  * and the pipeline's driver-local connected-components fast path, so both
  * produce identical (id -> component) labelings. */
object UnionFind {

  def components(nodes: Iterable[String], edges: Iterable[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for (n <- nodes) parent.getOrElseUpdate(n, n)
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }
}
