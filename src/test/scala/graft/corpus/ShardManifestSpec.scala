package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardManifestSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(n: Int) =
    (1 to n).map(i => (i.toLong, "t " * (i % 7))).toDF("doc_id", "text")

  test("assign is deterministic, in-range, and partitioning-invariant") {
    val df = docsDf(200)
    val ref = ShardManifest.assign(df, 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(ref.values.forall(s => s >= 0 && s < 16))
    assert(ref.values.toSet.size > 1) // spreads, not one bucket
    val again = ShardManifest.assign(df.repartition(5), 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(again == ref)
    // re-derivable from the documented arithmetic: first 6 hex chars
    // of md5(id-as-string) mod n
    val md = java.security.MessageDigest.getInstance("MD5")
    val byHand = ref.keys.map { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      id -> java.lang.Long.parseLong(hex, 16) % 16
    }.toMap
    assert(byHand == ref)
  }

  test("manifest aggregates docs and char mass per shard; null id shards to null") {
    val df = Seq((java.lang.Long.valueOf(1L), "abc"),
      (java.lang.Long.valueOf(2L), null),
      (null.asInstanceOf[java.lang.Long], "xy"))
      .toDF("doc_id", "text")
    val out = ShardManifest.manifest(df, 4)
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(-1L) == (1L, 2L)) // the null-id doc survives to the manifest
    assert(out.filterKeys(_ >= 0).values.map(_._1).sum == 2L)
    assert(out.values.map(_._2).sum == 5L)
    intercept[IllegalArgumentException] { ShardManifest.manifest(df, 0) }
  }

  test("writeSharded lays out shard=K dirs and a manifest matching the read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    // row-counting UDF: proves the upstream DAG executes exactly ONCE
    // (the shard write) — the manifest must come from the written
    // parquet, not a second source pass
    val seen = spark.sparkContext.longAccumulator("rows-seen")
    val tap = udf { (t: String) => seen.add(1); t }
    val df = docsDf(100).withColumn("text", tap(col("text")))
    val m = ShardManifest.writeSharded(df, dir, 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(seen.value == 100L)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("shard=")) == m.size)
    assert(dirs.contains("_manifest")) // underscore-prefixed: invisible to readers of dir
    // one-shard-per-task contract: every shard dir holds exactly one file
    dirs.filter(_.startsWith("shard=")).foreach { d =>
      val parts = new java.io.File(dir, d).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"$d should hold exactly one part file")
    }
    // Spark reads the data back WITHOUT the manifest riding along
    val back = spark.read.parquet(dir)
    assert(back.count() == 100L && back.columns.contains("shard"))
    val backCounts = back.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(backCounts == m.map { case (k, v) => k -> v._1 })
    val persisted = spark.read.parquet(dir + "/_manifest")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(persisted == m)
  }
}
