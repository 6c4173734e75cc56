package graft.tools

/** Dev utility: print the declared contract counts (queries / oracle
  * entries) so SURVEY totals can be cross-checked mechanically. */
object CountCheck {
  def main(args: Array[String]): Unit =
    println("queries=" + graft.SparkEntry.queries.size +
      " oracles=" + graft.SparkEntry.oracleSql.size)
}
