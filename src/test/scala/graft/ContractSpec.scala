package graft

/** Driver-contract safety net:
  *   - every oracle key has a query (a typo'd key would silently skip the
  *     correctness check for that operator);
  *   - every query executes and yields rows at sf0.001 (Verify swallows
  *     per-query exceptions into stderr, so an always-throwing query would
  *     otherwise only surface as a missing output dir);
  *   - column names match between result and what the oracle SELECTs
  *     (the driver hash sorts columns by name — a mismatch fails the gate).
  */
class ContractSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query executes with rows > 0 at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every side-table an oracle references has a registered dump") {
    val ref = "\\{VERIFY_DIR\\}/([A-Za-z0-9_]+)\\.parquet".r
    val referenced = SparkEntry.oracleSql.values
      .flatMap(sql => ref.findAllMatchIn(sql).map(_.group(1))).toSet
    val missing = referenced -- SparkEntry.sideDumps.keySet
    assert(missing.isEmpty, s"oracles reference undumped side-tables: $missing")
    // and nothing is dumped for no reason (dead cost in Verify)
    val unused = SparkEntry.sideDumps.keySet -- referenced
    assert(unused.isEmpty, s"side dumps no oracle reads: $unused")
  }

  /** Testdata-schema canary: pins the PHYSICAL parquet type of every
    * driver-table column the engine depends on, straight from the file
    * footers (no Spark read path, so a type Spark cannot even load —
    * round 5's INT64 TIMESTAMP(NANOS) flip — still produces a named
    * assertion, not 54 downstream query failures). When the driver
    * regenerates `/root/testdata` with a changed encoding, THIS test fails
    * with the table.column and the new type, pointing at the loader to
    * update (`Tables.events` et al.). `events.ts` deliberately admits both
    * encodings the schema-dispatched loader handles.
    */
  test("testdata physical schema matches the pinned contract") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path

    def describe(t: org.apache.parquet.schema.Type): String =
      if (t.isPrimitive) {
        val p = t.asPrimitiveType.getPrimitiveTypeName.toString.toLowerCase
        Option(t.getLogicalTypeAnnotation).map(a => s"$p ($a)").getOrElse(p)
      } else {
        val ann = Option(t.getLogicalTypeAnnotation).map(a => s" ($a)").getOrElse("")
        val elem = // standard 3-level LIST nesting: group > repeated > element
          try describe(t.asGroupType.getType(0).asGroupType.getType(0))
          catch { case _: Throwable => "?" }
        s"group$ann of $elem"
      }

    val str = "binary (STRING)"
    val tsUs = "int64 (TIMESTAMP(MICROS,false))"
    val expected: Map[String, Map[String, Set[String]]] = Map(
      "events" -> Map(
        "event_id" -> Set("int64"),
        // both encodings the dispatched loader survives (see Tables.events)
        "ts" -> Set(tsUs, "int64 (TIMESTAMP(NANOS,false))"),
        "user_id" -> Set("int64"), "event_type" -> Set(str),
        "value" -> Set("double"), "props" -> Set(str)),
      "documents" -> Map(
        "doc_id" -> Set("int64"), "text" -> Set(str), "lang" -> Set(str),
        "source" -> Set(str), "n_chars" -> Set("int64")),
      "embeddings" -> Map(
        "vec_id" -> Set("int64"), "embedding" -> Set("group (LIST) of float"),
        "label" -> Set("int32")),
      "lineitem" -> Map(
        "l_orderkey" -> Set("int64"), "l_partkey" -> Set("int64"),
        "l_suppkey" -> Set("int64"), "l_linenumber" -> Set("int32"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set(str), "l_linestatus" -> Set(str),
        "l_shipdate" -> Set(tsUs)),
      "orders" -> Map(
        "o_orderkey" -> Set("int64"), "o_custkey" -> Set("int64"),
        "o_orderstatus" -> Set(str), "o_totalprice" -> Set("double"),
        "o_orderdate" -> Set(tsUs), "o_orderpriority" -> Set(str)),
      "customer" -> Map(
        "c_custkey" -> Set("int64"), "c_name" -> Set(str),
        "c_nationkey" -> Set("int32"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set(str)),
      "supplier" -> Map(
        "s_suppkey" -> Set("int64"), "s_name" -> Set(str),
        "s_nationkey" -> Set("int32"), "s_acctbal" -> Set("double")),
      "part" -> Map(
        "p_partkey" -> Set("int64"), "p_name" -> Set(str),
        "p_brand" -> Set(str), "p_type" -> Set(str),
        "p_size" -> Set("int32"), "p_retailprice" -> Set("double")),
      "nation" -> Map(
        "n_nationkey" -> Set("int32"), "n_name" -> Set(str),
        "n_regionkey" -> Set("int32")),
      "region" -> Map(
        "r_regionkey" -> Set("int32"), "r_name" -> Set(str)))

    val conf = spark.sessionState.newHadoopConf()
    val drifted = for {
      sfDir <- Seq("sf0.001", "sf0.01", "sf0.1")
      (tbl, cols) <- expected.toSeq.sortBy(_._1)
      footer = {
        val p = new Path(s"/root/testdata/$sfDir/$tbl.parquet")
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFileMetaData.getSchema finally r.close()
      }
      (col, allowed) <- cols.toSeq.sortBy(_._1)
      actual = if (footer.containsField(col))
                 describe(footer.getType(footer.getFieldIndex(col)))
               else "MISSING"
      if !allowed.contains(actual)
    } yield s"$sfDir/$tbl.$col is now `$actual` (expected one of $allowed)" +
      " — update the matching Tables loader"
    assert(drifted.isEmpty, drifted.mkString("\n"))
  }

  test("every vec_id is a doc_id, incl. the s15 query seed (s15's contract)") {
    // s15_hybrid_rrf fuses a doc_id-keyed BM25 arm with a vec_id-keyed
    // cosine arm under one id. The contract that fusion needs: vectors
    // are a SUBSET of documents (a doc without a vector just lacks a
    // dense contribution — at sf0.1 the generator embeds only the first
    // 2000 of 5000 docs, which is the production shape too), and the
    // query seed id 0 exists on both sides. If a regeneration decouples
    // the id spaces, fail HERE by name instead of s15 silently fusing
    // unrelated ids.
    import org.apache.spark.sql.functions._
    for (sfDir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = spark.read.parquet(s"/root/testdata/$sfDir/documents.parquet")
        .select(col("doc_id").as("id"))
      val e = spark.read.parquet(s"/root/testdata/$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"))
      val orphanVecs = e.exceptAll(d).count()
      assert(orphanVecs == 0,
        s"$sfDir: $orphanVecs vec_ids have no document — revisit s15's " +
          "query-by-example join key")
      assert(d.filter(col("id") === 0L).count() == 1 &&
        e.filter(col("id") === 0L).count() == 1,
        s"$sfDir: query seed id 0 missing from documents or embeddings")
    }
  }

  test("every side dump executes with rows > 0 at sf0.001") {
    val empty = SparkEntry.sideDumps.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty side dumps: $empty")
  }
  /** Verify-side dump-schema canary (the table-footer canary's sibling,
    * VERDICT r7 ask #8): the oracle SQL for the sketch queries replays
    * pipelines FROM these dumped frames by column name and type, so a
    * refactor that renames/retypes a dump column would surface as
    * hash-mismatches in every downstream sketch query instead of one
    * named failure. Pins each sidecar's (name -> Spark type) exactly —
    * additions are failures too (the dump is Verify cost; an unread
    * column is dead weight the unused-dump test above cannot see).
    */
  test("side-dump schemas match the pinned contract") {
    val expected: Map[String, Map[String, String]] = Map(
      "side_dd4_sketches" -> Map("doc_id" -> "bigint", "sh" -> "bigint"),
      "side_doc_sigs" -> Map("doc_id" -> "bigint", "lang" -> "string",
        "sig" -> "array<bigint>"),
      "side_hll_est" -> Map("source" -> "string", "n_est" -> "bigint"),
      "side_s4_assign" -> Map("vec_id" -> "bigint", "cent_id" -> "bigint",
        "unit" -> "array<double>"),
      // dd17's own proportional-stride assignment (round 12 — ADVICE
      // r11: the shared side_s4_assign replay was scale-conditional);
      // same shape as side_s4_assign, dumped at PqAnchorStride
      "side_dd17_assign" -> Map("vec_id" -> "bigint",
        "cent_id" -> "bigint", "unit" -> "array<double>"),
      "side_s8_codes" -> Map("vec_id" -> "bigint",
        "unit" -> "array<double>", "codes" -> "array<bigint>"),
      "side_s9_cents" -> Map("cent_id" -> "bigint",
        "cent" -> "array<double>", "cnorm" -> "double"),
      "side_sq_codes" -> Map("vec_id" -> "bigint",
        "unit" -> "array<double>", "codes" -> "array<int>"),
      "side_srp_sigs" -> Map("vec_id" -> "bigint",
        "unit" -> "array<double>", "sig" -> "bigint"),
      "side_mm10_img" -> Map("media_id" -> "bigint",
        "img_unit" -> "array<double>"))
    assert(SparkEntry.sideDumps.keySet == expected.keySet,
      s"side-dump set drifted: only-code=${SparkEntry.sideDumps.keySet -- expected.keySet} " +
        s"only-pin=${expected.keySet -- SparkEntry.sideDumps.keySet} — " +
        "update this pin AND the oracle SQL that reads the dump")
    val drifted = SparkEntry.sideDumps.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val actual = fn(spark, sf).schema.fields
          .map(f => f.name -> f.dataType.simpleString).toMap
        spark.catalog.clearCache()
        if (actual != expected(name))
          Some(s"$name: $actual (pinned ${expected(name)})")
        else None
    }
    assert(drifted.isEmpty, drifted.mkString("\n") +
      " — the oracle replays read these columns by name; update both")
  }

}
