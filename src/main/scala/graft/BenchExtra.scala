package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.near.{MinHashLSH, SimHash}

/** r6 auxiliary benchmark (guide §1.4 noop-sink isolation): per-stage
  * timings of the synth dedup pipeline, so OPTIMIZATION_r06.md can
  * attribute pipeline_synth wall time to stages. NOT part of the
  * driver contract — Bench.scala is the frozen measurement surface.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val synthRows = sys.env.getOrElse("SPARK_GRAFT_SYNTH_ROWS", "20000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.corpus.Corpus.docs(spark, synthRows).toDF()
      .repartition(cpus.toInt * 2).persist()
    docs.count()
    // warm-up (full pipeline, quarter corpus), same as Bench
    graft.pipeline.DedupPipeline.run(
        graft.corpus.Corpus.docs(spark, synthRows / 4).toDF()
          .repartition(cpus.toInt * 2))
      .clusters.write.format("noop").mode("overwrite").save()

    val reps = sys.env.getOrElse("SPARK_GRAFT_PIPE_REPS", "2").toInt
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def best(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      results(name) = (1 to reps).map(_ => time(f)).min
      spark.sparkContext.setJobDescription(null)
    }

    val cfg = graft.pipeline.DedupPipeline.Config()
    val valid = docs.filter(col("text").isNotNull)
    val canon = graft.report.Report.dedupIdentity(valid)
    val textDocs = canon.filter(trim(col("text")) =!= "")

    best("stage_signatures") {
      noop(MinHashLSH.signatures(textDocs, cfg.minhash))
    }
    val sigs = MinHashLSH.signatures(textDocs, cfg.minhash).persist()
    sigs.count()
    best("stage_mh_candidates") {
      noop(MinHashLSH.candidatesAndSkips(sigs, cfg.minhash))
    }
    best("stage_sh_edges") {
      noop(SimHash.edgesAndSkips(
        SimHash.fingerprintsFromShingles(sigs, cfg.simhash), cfg.simhash))
    }
    val mhPairs = MinHashLSH.candidatesAndSkips(sigs, cfg.minhash)
      .filter(col("src").isNotNull).select("src", "dst").distinct().persist()
    mhPairs.count()
    best("stage_mh_verify") {
      noop(MinHashLSH.verifyCandidates(mhPairs, sigs, cfg.minhash))
    }
    best("stage_canon_only") {
      noop(canon)
    }
    best("stage_digest_proj") {
      noop(canon.select(col("url") +:
        graft.functions.Digests.cascade(col("html"), cfg.algs)
          .zipWithIndex.map { case (d, i) => d.expr.as(s"k$i") }: _*))
    }
    best("stage_exact_engine_valid") {
      noop(graft.engine.DedupEngine.run(valid, "url",
        graft.functions.Digests.cascade(col("html"), cfg.algs)).assignments)
    }
    best("stage_exact_engine") {
      noop(graft.engine.DedupEngine.run(canon, "url",
        graft.functions.Digests.cascade(col("html"), cfg.algs)).assignments)
    }
    best("stage_alias_identity") {
      noop(canon.select(col("url")))
    }
    val r = graft.pipeline.DedupPipeline.run(docs)
    best("stage_cc_from_edges") {
      noop(graft.cluster.ConnectedComponents.run(r.edges.select("src", "dst")))
    }
    best("pipeline_full") {
      noop(graft.pipeline.DedupPipeline.run(docs).clusters)
    }
    sigs.unpersist(); mhPairs.unpersist()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"pipeline_stages","stages":$qs,"rows":$synthRows,"cpus":$cpus}""")
    spark.stop()
  }
}
