package graft.progress

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Live progress/metrics stream (SURVEY §2.1 S5): the Spark-native
  * re-expression of the reference's per-1000-files `--progress`
  * ticker (`CLI.pm:125-156`, `Files.pm:237`).
  *
  * The reference counts files as its single-threaded scan loop touches
  * them; a distributed plan has no such loop, so the equivalent
  * first-class mechanism is `Dataset.observe` — named aggregates
  * accumulated DURING execution and delivered to a
  * `QueryExecutionListener` when each action completes, without
  * triggering extra jobs. `tap()` instruments any stage boundary;
  * `ProgressListener` routes the observations to stderr (console
  * parity) and retains them for the metrics table / tests.
  */
object Progress {

  /** Instrument a frame: rows + bytes flowing through this point of
    * the plan, reported under `name`. Zero extra jobs — piggybacks on
    * whatever action consumes the frame.
    */
  def tap(df: DataFrame, name: String, byteCol: Option[String] = None): DataFrame = {
    val metrics = count(lit(1)).as("rows") +:
      byteCol.map(c => coalesce(sum(octet_length(col(c))), lit(0L)).as("bytes")).toSeq
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  final case class Observation(name: String, action: String, metrics: Map[String, Any])

  /** Collects every observed metric; optionally echoes to stderr the
    * way the reference's --progress ticker wrote to the console.
    */
  final class ProgressListener(echo: Boolean = true) extends QueryExecutionListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Observation]()

    def observations: Seq[Observation] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      qe.observedMetrics.foreach { case (name, row) =>
        val m = row.getValuesMap[Any](row.schema.fieldNames.toIndexedSeq)
        buf.add(Observation(name, funcName, m))
        if (echo) {
          val kv = m.map { case (k, v) => s"$k=$v" }.mkString(" ")
          System.err.println(
            f"[progress] $name: $kv (${funcName}, ${durationNs / 1e9}%.1f s)")
        }
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }
}
