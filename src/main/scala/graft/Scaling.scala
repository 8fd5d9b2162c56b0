package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md): the same end-to-end
  * dedup pipeline over IDENTICAL input bytes (seeded synthetic corpus,
  * fixed partition count) at two parallelism levels — local[4] vs
  * local[16] as the sandbox proxy for N vs 4N executors (4→16 sits in
  * the host's linear hardware-scaling range; 16→32 shares memory
  * bandwidth). Prints one JSON line per level plus the efficiency
  * (T_low/T_high)/4.
  *
  * Env: SPARK_GRAFT_SYNTH_ROWS (default 600000),
  * SPARK_GRAFT_SCALE_LEVELS (default "4,16,4,16" — interleaved
  * best-of against host drift), SPARK_GRAFT_SCALE_REPS (default 3).
  *
  * The measured protocol (BASELINE.md round 2) uses
  * SPARK_GRAFT_SYNTH_ROWS=2400000 SPARK_DRIVER_MEM=48g
  * SPARK_GRAFT_SCALE_LEVELS=16,4 SPARK_GRAFT_SCALE_REPS=2: the
  * pipeline carries a ~20 s core-count-independent serial floor (AQE
  * stage barriers + job scheduling across ~40 shuffle stages), so
  * measured efficiency RISES with input size as Amdahl's fixed term
  * amortizes — at cluster-scale inputs it vanishes entirely.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    // defaults match the measured BASELINE.md protocol: 4 vs 16 cores
    // (N vs 4N inside the host's linear hardware-scaling range)
    val rows = sys.env.getOrElse("SPARK_GRAFT_SYNTH_ROWS", "600000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEVELS", "4,16,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val times = scala.collection.mutable.LinkedHashMap.empty[Int, Double]

    for (cpus <- levels) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGESIZE", "4m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
            val cpu = i.taskMetrics.executorRunTime / 1000.0
            if (wall > 0.3)
              println(f"JOBLOG[$cpus] stage ${i.stageId}%4d ${i.numTasks}%4d tasks wall $wall%6.2f s taskSum $cpu%7.2f s  ${i.name.take(60)}")
          }
        })
      }

      // identical bytes + identical partitioning at every level: the
      // generator is a pure function of (seed, index) and the input
      // partition count is fixed at 64 regardless of cores
      val docs = graft.corpus.Corpus.docs(spark, rows).toDF()
        .repartition(64).persist()
      docs.count()

      // JIT/codegen warm-up OUTSIDE the timed window: an untimed
      // iteration over a quarter-size corpus — the first pipeline in a
      // fresh JVM runs ~2× slower on C2-cold UDF loops, which would
      // bias whichever level runs first. (NOT docs.limit(n): a global
      // limit collapses to one partition and warms up serially.)
      graft.pipeline.DedupPipeline.run(
          graft.corpus.Corpus.docs(spark, rows / 4).toDF().repartition(64))
        .clusters.write.format("noop").mode("overwrite").save()

      // best-of-N: the sandbox host is shared and individual runs see
      // 2-3× noise from neighbors; min is the capability estimate.
      // Levels may repeat in SPARK_GRAFT_SCALE_LEVELS (e.g. 4,16,4,16)
      // to interleave A/B against host drift — min accumulates.
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
      val sec = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        docs.persist(); docs.count()
        val t0 = System.nanoTime()
        graft.pipeline.DedupPipeline.run(docs)
          .clusters.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      times(cpus) = math.min(times.getOrElse(cpus, Double.MaxValue), sec)
      println(f"""{"metric":"scaling","cpus":$cpus,"rows":$rows,"sec":$sec%.2f,"docs_per_sec":${rows / sec}%.1f,"reps":$reps}""")
      spark.stop()
    }

    if (times.size == 2) {
      val lowC = times.keys.min; val highC = times.keys.max
      val lo = times(lowC); val hi = times(highC)
      val factor = highC.toDouble / lowC
      val eff = (lo / hi) / factor
      println(f"""{"metric":"scaling_efficiency","n_to_4n":$eff%.3f,"t_low":$lo%.2f,"t_high":$hi%.2f,"factor":$factor%.0f}""")
    }
  }
}
