package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components via the alternating
  * large-star / small-star algorithm [EXT] (north rule; the
  * Catalyst-planned-self-join formulation — Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14).
  *
  * Node ids are STRINGS (urls): 64-bit surrogate ids would collide at
  * 10^12 nodes (birthday bound), so ordering is lexicographic and the
  * component id is the minimum member — which also mirrors the
  * reference CLI's alphabetical-min canonical rule (CLI.pm:282).
  *
  * Each iteration is two shuffled group-by/join rounds over the
  * (shrinking, star-ifying) edge list; `localCheckpoint` cuts lineage
  * so the loop's plan doesn't grow (SURVEY §4.2).
  */
object ConnectedComponents {

  /** edges: DataFrame(src, dst) string columns, undirected.
    * Returns (id, component) covering every endpoint; callers union
    * isolated nodes themselves (component = own id).
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      // canonical orientation matches the star outputs (src = greater,
      // dst = smaller) so the fixpoint compare sees stable sets
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
      // EAGER deliberately (r6 A/B): lazy was measured worse — both
      // union branches of iteration 1's sym race to compute the
      // uncached partitions, doubling the edge-prep work
      .localCheckpoint()

    // convergence check: (count, order-independent xor-of-hashes)
    // signature of the canonical edge set — one cheap aggregate per
    // iteration instead of two full exceptAll shuffles
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // lazy localCheckpoint: the signature aggregate materializes the
    // iteration's edges — ONE job per iteration, not two. Iteration 1
    // always changes (orientation/star-ification), so its convergence
    // probe is skipped outright.
    var sig = (-1L, 0L)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val ls = largeStar(e)
      val ss = smallStar(ls).localCheckpoint(false)
      val s2 = signature(ss)
      converged = iter > 0 && s2 == sig
      sig = s2
      e = ss
      iter += 1
    }
    if (sys.env.contains("SPARK_GRAFT_CC_LOG"))
      System.err.println(s"[cc] converged=$converged iterations=$iter")
    // stars: dst is the root; every node maps to its root, roots to themselves
    val members = e.select(col("src").as("id"), col("dst").as("component"))
    val roots = e.select(col("dst").as("id"), col("dst").as("component")).distinct()
    members.unionByName(roots)
      .groupBy("id").agg(min(col("component")).as("component"))
  }

  /** Attach m(src) = min(dst) per src. SKEW-SAFE: a partial-aggregating
    * groupBy (map-side combine — a 10M-edge hub reduces to one row per
    * input partition before the shuffle) followed by a join back on
    * src, which AQE's skew-join splits when a hub key dominates. The
    * previous Window.partitionBy(src) min sorted ALL of a hub's edges
    * in ONE task — the 100×-scale stall this replaces.
    */
  private def withMin(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy(col("src")).agg(min(col("dst")).as("m"))
    edges.join(mins, "src")
  }

  /** Emit the star edges in ONE pass: a self-union of the joined
    * (src, dst, m) frame would duplicate the groupBy+join subtree into
    * both branches (Spark re-executes unshared subplans), doubling
    * every iteration's work — explode emits both output edges per row
    * instead.
    */
  private def emitPairs(withM: DataFrame, emitDstCond: Column): DataFrame =
    withM
      .select(explode(when(emitDstCond,
        array(struct(col("dst").as("a"), col("m").as("b")),
          struct(col("src").as("a"), col("m").as("b"))))
        .otherwise(array(struct(col("src").as("a"), col("m").as("b"))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"), least(col("a"), col("b")).as("dst"))

  /** large-star: each node u connects its larger neighbors to its
    * current minimum m(u) = min(Γ(u) ∪ {u}). Output may contain
    * duplicate edges; smallStar's terminal distinct dedups once per
    * iteration (stage count per iteration is the serial critical
    * path, SCALE.md).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val withM = withMin(sym).withColumn("m", least(col("m"), col("src")))
    emitPairs(withM, col("dst") > col("src"))
  }

  /** small-star: orient edges large→small; each node connects its
    * smaller-or-equal neighbors to its minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    emitPairs(withMin(dir), col("dst") =!= col("m")).distinct()
  }
}
