package graft.tools
object CheckCounts {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} q-o=${(q -- o).mkString(",")} o-q=${(o -- q).mkString(",")}")
  }
}
