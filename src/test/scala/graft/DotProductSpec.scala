package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class DotProductSpec extends SparkSuite {

  test("DotProduct expression matches kernel and handles nulls/lengths") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.5, -1.5), Seq(2.0, 2.0))
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorFunctions.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 32.0)
    assert(out(2L) == -2.0)
    // null input → null out
    val withNull = Seq((1L, Option(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("d")).head()
    assert(withNull.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // parquet-backed scan (a literal frame constant-folds to a
    // LocalTableScan with no codegen stage at all)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = e.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    // the `*(n)` prefix in the plan string marks WholeStageCodegen spans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), s"no codegen span:\n$plan")
    assert(df.head().getDouble(0) > 0.0)
  }

  test("graft_dot registered as a SQL function via extensions") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("fused CosineSim equals composed dot/(norm*norm) bit-for-bit") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val q = typedlit((0 until 64).map(i => math.sin(i + 1.0)))
    val both = e.select(
      VectorFunctions.cosine(col("embedding"), q).as("fused"),
      (VectorFunctions.dot(col("embedding"), q) /
        (VectorFunctions.norm(col("embedding")) * VectorFunctions.norm(q))).as("composed"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_cosine SQL function") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }

  test("graft_sig_agree SQL function") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_sig_agree(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS s")
      .head().getDouble(0)
    assert(v == 0.5)
  }

  test("cosine via expression equals compiled-kernel cosine on embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val rows = e.select(
      VectorFunctions.cosine(col("embedding"), col("embedding")).as("self"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("SigAgree expression equals the HOF formulation slot-for-slot") {
    import graft.functions.HashFunctions.minhashSimilarity
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200) {
      val n = 1 + rnd.nextInt(6)
      val a = Seq.fill(n)(rnd.nextLong() % 4) // collisions on purpose
      val b = if (rnd.nextBoolean()) a.take(1 + rnd.nextInt(n)) // unequal len
        else Seq.fill(n)(rnd.nextLong() % 4)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val hof = size(filter(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)), x => x === 1))
      .cast("double") / least(size(col("a")), size(col("b"))).cast("double")
    val got = df.select(
        minhashSimilarity(col("a"), col("b")).as("e"), hof.as("h"))
      .collect()
    got.foreach { r =>
      val (e, h) = (r.getDouble(0), r.getDouble(1))
      assert(e == h, s"expr $e != hof $h")
    }
    // empty-signature edge: the ANSI-mode HOF would throw DIVIDE_BY_ZERO;
    // the expression yields 0.0 — NOT NaN, which Spark orders above every
    // double and which would therefore pass any >= threshold filter
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(minhashSimilarity(col("a"), col("b"))).head().getDouble(0)
    assert(empty == 0.0)
    // a null slot never counts as a match (the HOF's guarantee)
    val withNull = Seq((Seq[java.lang.Long](0L, null), Seq[java.lang.Long](0L, 0L)))
      .toDF("a", "b")
      .select(minhashSimilarity(col("a"), col("b"))).head().getDouble(0)
    assert(withNull == 0.5)
    // and it stays inside the codegen stage on the dd3 re-rank shape:
    // parquet-backed scan (a literal frame constant-folds to a
    // LocalTableScan with no codegen stage at all; an exchange would wrap
    // the plan in a not-yet-finalized AQE node), `*(n)` marks the span
    import graft.functions.HashFunctions.{minhash, shingles}
    import graft.functions.TextFunctions.tokens
    val sigs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(minhash(shingles(tokens(col("text"))), 32).as("sig"))
    val plan = sigs.select(minhashSimilarity(col("sig"), col("sig")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_sig_agree"),
      s"no codegen span:\n$plan")
  }
  test("LinearTextScore: tokenization, hashing, edge cases, parity") {
    import spark.implicits._
    import graft.functions.TextFunctions.linearTextScore
    val w = typedlit(graft.queries.Text.QualityWeights)
    // reference model in plain Scala: [A-Za-z]+ runs, lowercase, 31-poly
    def ref(text: String): Double = {
      val toks = "[A-Za-z]+".r.findAllIn(text).map(_.toLowerCase).toSeq
      if (toks.isEmpty) 0.0
      else toks.map { t =>
        val h = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1048576L)
        graft.queries.Text.QualityWeights((h % 512).toInt)
      }.sum / toks.size
    }
    val texts = Seq(
      "The quick-BROWN fox, jumps!",   // mixed case + punctuation
      "caf\u00e9 na\u00efve r\u00e9sum\u00e9",  // multi-byte bytes must separate
      "a",                              // single 1-char token
      "123 456 !!!",                    // no letter runs -> 0.0
      "")                               // empty -> 0.0
    val got = texts.zipWithIndex.map(_.swap).toDF("id", "t")
      .select($"id", linearTextScore($"t", w).as("sc"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == ref(t), s"text '$t': got ${got(i)} want ${ref(t)}")
    }
    // null text -> null score
    val n = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(linearTextScore($"t", w).as("sc")).head()
    assert(n.isNullAt(0))
    // codegen parity: the parquet-backed scan runs the generated loop —
    // same values as the literal-frame (interpreted/fallback) path
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val plan = docs.select(linearTextScore(col("text"), w).as("sc"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_text_score"), s"expression missing:\n$plan")
    val fromScan = docs.select($"doc_id",
      linearTextScore(col("text"), w).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ref(r.getString(1))).toMap
    assert(fromScan == local, "codegen path diverges from reference model")
  }

  test("graft_text_score registered as a SQL function via extensions") {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val v = spark.sql(
      """SELECT graft_text_score('aa bb', array(0.5D, -0.25D)) AS s""")
      .head().getDouble(0)
    // h('aa') = (0*31+97)*31+97 mod 2^20 = 3104; h('bb') = (0*31+98)*31
    // + 98 = 3136 — bucket = h mod 2 decides which weight each token reads
    val wAA = if (3104 % 2 == 0) 0.5 else -0.25
    val wBB = if (3136 % 2 == 0) 0.5 else -0.25
    assert(v == (wAA + wBB) / 2.0)
  }

}
