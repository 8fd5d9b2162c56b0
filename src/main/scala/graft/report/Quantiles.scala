package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution quantiles WITHOUT a global row sort — the
  * corpus-hygiene report behind length/size cut decisions ("what is
  * the p95 doc length?", "where does the Gopher 50-token floor sit
  * in THIS crawl?"). `approx_percentile` can't be oracle-compared
  * and its error bound moves with the data; this is exact.
  *
  * Semantics: lower-bound (discrete) quantile — for percentile q
  * over n rows, the SMALLEST value v whose cumulative count reaches
  * ceil(q·n/100) (so q=50 is the 'ceil(n/2)-th smallest'; q=100 is
  * the max). Pure integer arithmetic, bit-identical across engines.
  *
  * Scale shape: one (value)-keyed count agg (map-side combinable —
  * the full corpus collapses to its |distinct values| rows before
  * any wide exchange), then a running sum over THAT frame. The
  * cumulative window is a single-partition sort over |distinct
  * values| rows — for the integer measures this report exists for
  * (lengths, token counts, cluster sizes) that is thousands of rows
  * at 10^12 docs, not a corpus sort. The percentile probe is a
  * broadcast crossJoin of a |qs|-row literal frame against the
  * distinct-value frame, reduced by one more map-side-combinable
  * min.
  */
object Quantiles {

  /** (q, value) for each requested percentile (1..100) of
    * `valueCol`, exact lower-bound semantics; nulls excluded.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"percentiles must be in 1..100: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = counts.select(col("v"), col("cnt"),
      sum(col("cnt")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    cum
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(qs.distinct.sorted.toDF("q")))
      // threshold ceil(q*n/100) in integers; q<=100 keeps it <= n
      .filter(col("cum") >= expr("(q * n + 99) DIV 100"))
      .groupBy(col("q"))
      .agg(min(col("v")).as("value"))
  }
}
