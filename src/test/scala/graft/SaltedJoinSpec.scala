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
