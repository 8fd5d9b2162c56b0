package graft.report

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("linear-counting branch: small per-group cardinalities are near-exact") {
    // 3 groups with 30 / 120 / 400 distinct values (plus exact dups that
    // must not move the sketch) — all well inside the LC regime at p=12.
    val df = (0 until 30).map(i => ("a", s"a$i")) ++
      (0 until 120).flatMap(i => Seq(("b", s"b$i"), ("b", s"b$i"))) ++
      (0 until 400).map(i => ("c", s"c$i"))
    val est = Cardinality.hllDistinct(df.toDF("k", "v"), Seq("k"), col("v"), p = 12)
      .select("k", "est").as[(String, Long)].collect().toMap
    val exact = Map("a" -> 30L, "b" -> 120L, "c" -> 400L)
    for ((k, n) <- exact) {
      val e = est(k)
      // LC stderr at p=12 and n<=400 is < 1%; allow 5% + slack of 3
      assert(math.abs(e - n) <= math.max(3L, n / 20),
        s"group $k: est $e vs exact $n")
    }
  }

  test("raw-estimator branch: 100k distincts at p=12 within 5%") {
    val df = spark.range(100000).select(lit("g").as("k"),
      concat(lit("row-"), col("id")).as("v"))
    val Seq((v, e)) = Cardinality.hllDistinct(df, Seq("k"), col("v"), p = 12)
      .select("v_zero", "est").as[(Long, Long)].collect().toSeq
    // est > 2.5m = 10240 forces the raw branch regardless of v_zero
    assert(e > 10240, s"expected the raw branch, est=$e v_zero=$v")
    assert(math.abs(e - 100000L) <= 5000, s"est $e vs exact 100000")
  }

  test("null values are skipped and duplicates are free") {
    val a = Seq(("k", Option("x")), ("k", Option("y")), ("k", None)).toDF("k", "v")
    val b = Seq(("k", "x"), ("k", "y"), ("k", "x"), ("k", "y"), ("k", "x")).toDF("k", "v")
    val ea = Cardinality.hllDistinct(a, Seq("k"), col("v")).select("v_zero", "s", "est").collect()
    val eb = Cardinality.hllDistinct(b, Seq("k"), col("v")).select("v_zero", "s", "est").collect()
    assert(ea.toSeq == eb.toSeq) // identical registers -> identical sketch
  }

  test("partitioning invariance: same sketch under repartition") {
    val df = spark.range(5000).select(
      (col("id") % 4).cast("string").as("k"),
      concat(lit("v"), col("id")).as("v"))
    val one = Cardinality.hllDistinct(df.repartition(1), Seq("k"), col("v"))
      .orderBy("k").collect().toSeq
    val many = Cardinality.hllDistinct(df.repartition(13), Seq("k"), col("v"))
      .orderBy("k").collect().toSeq
    assert(one == many)
  }

  test("register merge: union of halves equals the whole corpus sketch") {
    val whole = spark.range(20000).select(lit("g").as("k"),
      concat(lit("d"), col("id")).as("v"))
    val h1 = whole.filter(col("v").substr(2, 20).cast("long") % 2 === 0)
    val h2 = whole.filter(col("v").substr(2, 20).cast("long") % 2 === 1)
    val direct = Cardinality.hllDistinct(whole, Seq("k"), col("v")).collect().toSeq
    val merged = Cardinality.estimate(
      Cardinality.mergeRegisters(
        Cardinality.registers(h1, Seq("k"), col("v")),
        Cardinality.registers(h2, Seq("k"), col("v")), Seq("k")),
      Seq("k")).collect().toSeq
    assert(direct == merged)
  }

  test("p bounds are enforced") {
    val df = Seq(("k", "v")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Cardinality.hllDistinct(df, Seq("k"), col("v"), p = 6)
    }
    intercept[IllegalArgumentException] {
      Cardinality.hllDistinct(df, Seq("k"), col("v"), p = 15)
    }
  }
}
