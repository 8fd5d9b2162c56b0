package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SYNTH_ROWS", "60000").toLong
    for (cpus <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.host", "127.0.0.1").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"STAGE[$cpus] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
      val docs = graft.corpus.Corpus.docs(spark, rows).toDF().repartition(64).persist()
      t("gen")(docs.count())
      val valid = docs.filter(col("text").isNotNull)
      var canon: org.apache.spark.sql.DataFrame = null
      t("canon+persist") { canon = graft.report.Report.dedupIdentity(valid).persist(); canon.count() }
      t("exact-engine") {
        graft.engine.DedupEngine.run(canon, "url", graft.functions.Digests.defaultCascade(col("html")))
          .assignments.write.format("noop").mode("overwrite").save()
      }
      val textDocs = canon.filter(trim(col("text")) =!= "")
      var sigs: org.apache.spark.sql.DataFrame = null
      t("mh-sigs+persist") { sigs = graft.near.MinHashLSH.signatures(textDocs).persist(); sigs.count() }
      var cand: org.apache.spark.sql.DataFrame = null
      t("mh-cand") { cand = graft.near.MinHashLSH.candidates(sigs).persist(); cand.count() }
      t("mh-verify") {
        val sh = sigs.select(col("id"), col("shingles"))
        cand.join(sh.withColumnRenamed("id","src").withColumnRenamed("shingles","s1"), "src")
          .join(sh.withColumnRenamed("id","dst").withColumnRenamed("shingles","s2"), "dst")
          .count()
      }
      var sh2: org.apache.spark.sql.DataFrame = null
      t("simhash-edges") { sh2 = graft.near.SimHash.edges(textDocs).persist(); sh2.count() }
      t("cc") {
        graft.cluster.ConnectedComponents.run(
          cand.select("src","dst").unionByName(sh2.select("src","dst")))
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop()
    }
  }
}
