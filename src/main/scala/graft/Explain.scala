package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.host", "127.0.0.1")
    // SPARK_GRAFT_NO_BROADCAST=1 → see the shuffle-join plan a
    // cluster-scale input would produce (broadcast hides exchanges at
    // toy scale)
    // SPARK_GRAFT_NO_AQE=1 → static plan shows ReusedExchange nodes
    // (AQE performs the same reuse at runtime as query-stage reuse,
    // invisible to a pre-execution explain)
    val b2 = if (sys.env.contains("SPARK_GRAFT_NO_BROADCAST"))
      b.config("spark.sql.autoBroadcastJoinThreshold", "-1") else b
    val spark = (if (sys.env.contains("SPARK_GRAFT_NO_AQE"))
      b2.config("spark.sql.adaptive.enabled", "false") else b2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== PLAN $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
