package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.checkpoint.Catalog
import graft.corpus.Corpus

/** Checkpoint/resume semantics of the staged pipeline (north rule:
  * "resumes mid-run without recomputation").
  */
class CheckpointPipelineSpec extends SparkSpec {

  test("checkpointed run equals direct run; re-run resumes without rewriting stage tables") {
    val docs = Corpus.docs(spark, 400).toDF()
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val cat = new Catalog(dir, spark)

    val direct = DedupPipeline.run(docs)
    val staged = DedupPipeline.runCheckpointed(docs, cat, inputLineage = "corpus400")
    // identical cluster assignments
    assert(direct.clusters.exceptAll(staged.clusters).count() == 0)
    assert(staged.clusters.exceptAll(direct.clusters).count() == 0)

    def mtimes(name: String): Map[String, Long] = {
      val d = Paths.get(s"$dir/$name")
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    }
    val stagedCount = staged.clusters.count()
    val before = (mtimes("edges"), mtimes("clusters"))
    Thread.sleep(1100)
    val resumed = DedupPipeline.runCheckpointed(docs, cat, inputLineage = "corpus400")
    assert(resumed.clusters.count() == stagedCount)
    assert((mtimes("edges"), mtimes("clusters")) == before,
      "stage tables were rewritten on an unchanged-lineage resume")

    // changed config ⇒ lineage differs ⇒ stages recompute
    val changed = DedupPipeline.runCheckpointed(docs, cat,
      cfg = DedupPipeline.Config(ignoreEmpty = true), inputLineage = "corpus400")
    val changedCount = changed.clusters.count()
    assert(mtimes("edges") != before._1)
    assert(changedCount <= stagedCount)
  }

  test("deduped corpus stage uses the (days(warc_ts), lang) layout (north rule)") {
    val docs = Corpus.docs(spark, 300).toDF()
    val dir = Files.createTempDirectory("graft-ckpt-layout").toString
    val cat = new Catalog(dir, spark)
    val r = DedupPipeline.runCheckpointed(docs, cat, inputLineage = "corpus300")
    // physical directory layout: warc_day=YYYY-MM-DD/lang=xx
    import scala.jdk.CollectionConverters._
    val dayDirs = Files.list(Paths.get(s"$dir/deduped_docs")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("warc_day=")).toSeq
    assert(dayDirs.nonEmpty)
    val langDirs = Files.list(Paths.get(s"$dir/deduped_docs/${dayDirs.head}"))
      .iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("lang=")).toSeq
    assert(langDirs.nonEmpty)
    // one row per cluster canonical, pruned read works
    val deduped = r.dedupedDocs.get
    assert(deduped.count() ==
      r.clusters.select(col("cluster_id")).distinct().count())
    val oneLang = langDirs.head.stripPrefix("lang=")
    assert(cat.read("deduped_docs").filter(col("lang") === oneLang).count() > 0)
  }
}
