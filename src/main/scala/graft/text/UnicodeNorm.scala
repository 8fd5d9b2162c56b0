package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unicode hygiene for web corpora — two operators the byte-exact
  * cascade can't express:
  *
  *   - NFC normalize-then-hash dedup: the same visible text arrives
  *     from different editors as precomposed (U+00E9) vs combining
  *     (e + U+0301) sequences; canonical equivalence (Unicode TR15)
  *     says they are the SAME text, so dedup keys must be computed on
  *     the NFC normal form (the Dolma/HF-datasets convention). The
  *     one UDF is `java.text.Normalizer` (JDK, deterministic, pure);
  *     everything after it is the dedupNormalized machinery — md5
  *     occurrences, one map-side-combinable min, text never shuffles.
  *   - Script-mix fractions: per-script character mass (Latin,
  *     Cyrillic, Greek, CJK, Arabic) as exact integer ppm — the
  *     mixed-script spam / wrong-language-routing signal a single
  *     argmax langId can't carry. Counts via length-difference of a
  *     literal-range regexp_replace, a chain that is CHARACTER-
  *     identical in Spark and RE2 (the ranges are literal chars, no
  *     escape-syntax divergence), so the oracle replays it verbatim.
  *
  * Reference analog: digest normalization before keying
  * (DigestFactory.pm:139-152 hashes a canonical byte view); the
  * Unicode normal form is the text-corpus canonical view.
  */
object UnicodeNorm {

  /** NFC normal form; null-safe. The JDK normalizer is pure and
    * version-pinned by the JVM — record the JVM in lineage when NFC
    * keys persist into snapshots (Unicode adds compositions over
    * time the way new WARC fields appear).
    */
  val nfcUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** (id, cluster_id) under NFC-canonical text equality: min id per
    * NFC-md5 group via ONE map-side-combinable agg + a hash join back
    * — the dedupNormalized shape (no window sort, text rides no
    * shuffle; the 16-byte hash does).
    */
  def dedupNfc(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keyed = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), md5(nfcUdf(col(textCol))).as("nfc_md5"))
    val keepers = keyed.groupBy("nfc_md5").agg(min(col(idCol)).as("cluster_id"))
    keyed.join(keepers, "nfc_md5").select(col(idCol), col("cluster_id"))
  }

  /** The audited scripts, as LITERAL character ranges (both engines
    * see identical pattern chars): basic+Latin-1+extended Latin,
    * Cyrillic, Greek, CJK (Han + kana), Arabic.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-zÀ-ɏ]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "cjk" -> "[一-鿿぀-ヿ]",
    "arabic" -> "[؀-ۿ]")

  /** (id, len, <script>_ppm…) — per-script char mass in exact integer
    * ppm of the doc's char length (`DIV` floor, not `/`: double
    * division rounds near integers — the PageRank/Bm25 discipline).
    * Count = len − len(chars-of-class removed): one regexp_replace
    * per script, all map-side codegen'd; empty docs report 0 ppm.
    */
  def scriptMix(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
    val counted = ScriptRanges.foldLeft(base) { case (df, (name, range)) =>
      df.withColumn(s"${name}_n",
        (col("len") - length(regexp_replace(col("t"), range, ""))).cast("long"))
    }
    val ppm = ScriptRanges.foldLeft(counted) { case (df, (name, _)) =>
      df.withColumn(s"${name}_ppm",
        when(col("len") > 0, expr(s"(${name}_n * 1000000L) DIV len"))
          .otherwise(lit(0L)))
    }
    ppm.select(col(idCol) +: col("len") +:
      ScriptRanges.map { case (n, _) => col(s"${n}_ppm") }: _*)
  }
}
