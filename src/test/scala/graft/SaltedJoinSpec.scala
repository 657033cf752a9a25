package graft

import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

class SaltedJoinSpec extends SparkSuite {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 10000).map { i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("sp"))
      .orderBy("k").collect().toSeq
    val salted = SaltedJoin.join(fact, dim, "k", saltBuckets = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("sp"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("AQE skew-join splits the hot partition without salting") {
    import spark.implicits._
    // the q25 shape, unsalted, forced through a sort-merge join with AQE
    // skew handling on and thresholds scaled to fixture size: the hot
    // key's oversized shuffle partition must be split at runtime
    // (skew=true in the final adaptive plan) and the result must equal
    // the plain join — the evidence behind SaltedJoin's "reach for AQE
    // first" rule (PLANS.md: AQE skew-join vs SaltedJoin)
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (1 to 60000).map { i =>
        (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong)
      }.toDF("k", "payload").repartition(8)
      val dim = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("sp"))
        .orderBy("k")
      val rows = joined.collect().toSeq
      // final adaptive plan of the EXECUTED query (AQE decisions are
      // runtime decisions — an unexecuted twin stays isFinalPlan=false):
      // the skewed side's shuffle read must be split (skew=true)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n${plan.take(2000)}")
      val expect = fact.join(dim, "k").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("payload").as("sp"))
        .orderBy("k").collect().toSeq
      assert(rows == expect)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val fact = (1 to 8000).map(i => (7L, i.toLong)).toDF("k", "payload")
      .repartition(8)
    val salts = fact.withColumn("_salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(salts.length == 8)
    // uniformish: no bucket holds more than half
    assert(salts.max < 4000, salts.mkString(","))
  }
}
