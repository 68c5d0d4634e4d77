package graft
object CountCheck {
  def main(args: Array[String]): Unit = {
    println(s"[count] queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
  }
}
