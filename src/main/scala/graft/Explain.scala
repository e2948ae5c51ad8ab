package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, 8)
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"======== $name ========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
