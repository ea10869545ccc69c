package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, partition-independent, and ~trainFrac") {
    val df = spark.range(10000).toDF("id")
    val a = Split.hashSplit(df, "id", 0.8)
    val b = Split.hashSplit(df.repartition(13), "id", 0.8)
    val fracA = a.filter(col("split") === "train").count() / 10000.0
    assert(math.abs(fracA - 0.8) < 0.02) // 256-bucket quantization + binomial noise
    // same rows land in the same split regardless of partitioning
    val disagree = a.join(b.withColumnRenamed("split", "split_b"), "id")
      .filter(col("split") =!= col("split_b")).count()
    assert(disagree == 0)
  }

  test("hashSplit keeps a row's split when the corpus grows") {
    val small = Split.hashSplit(spark.range(100).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Split.hashSplit(spark.range(100000).toDF("id"), "id")
      .filter(col("id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == grown)
  }

  test("kfold is deterministic, partition-independent, and balanced") {
    val df = spark.range(10000).toDF("id")
    val a = Split.kfold(df, "id", 5)
    val b = Split.kfold(df.repartition(11), "id", 5)
    val disagree = a.join(b.withColumnRenamed("fold", "fold_b"), "id")
      .filter(col("fold") =!= col("fold_b")).count()
    assert(disagree == 0)
    val sizes = a.groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // binomial noise around 2000 per fold
    assert(sizes.values.forall(n => math.abs(n - 2000L) < 200))
  }

  test("kfold keeps a row's fold when the corpus grows") {
    val small = Split.kfold(spark.range(100).toDF("id"), "id", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grown = Split.kfold(spark.range(50000).toDF("id"), "id", 7)
      .filter(col("id") < 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == grown)
  }

  test("stratified sampleBy is reproducible for a fixed seed") {
    val df = (1 to 2000).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val f = Map("a" -> 0.5, "b" -> 0.1)
    val x = Split.stratified(df, "s", f, seed = 7L).collect().map(_.getInt(0)).toSeq
    val y = Split.stratified(df, "s", f, seed = 7L).collect().map(_.getInt(0)).toSeq
    assert(x == y)
    val aFrac = x.count(_ % 2 == 0) / 1000.0
    assert(math.abs(aFrac - 0.5) < 0.1)
  }
}
