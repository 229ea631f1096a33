package graft.tools
object CountRegistry {
  def main(a: Array[String]): Unit = {
    println(s"queries=${graft.SparkEntry.queries.size} oracled=${graft.SparkEntry.oracleSql.size}")
  }
}
