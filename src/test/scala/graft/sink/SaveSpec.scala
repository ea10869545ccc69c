package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.SparkSpec

class SaveSpec extends SparkSpec {
  import spark.implicits._

  private def csv(content: String): String = {
    val f = Files.createTempFile("graft_save", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("table name sanitization matches the reference regex (index.js:146)") {
    assert(Save.sanitizeTableName("My Orders!") == "myorders")
    assert(Save.sanitizeTableName("a_b-c 9") == "a_bc9")
  }

  test("A6 smart-id: synthetic id added iff no case-insensitive id selected") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val noId = csv("name,score\nann,10\nbob,20\n")
    val p1 = Save.ingest(spark, noId, wh, "t_no_id", Seq("name", "score"),
      Map("score" -> "INTEGER"))
    val df1 = spark.read.parquet(p1)
    assert(df1.columns.head == "id")
    assert(df1.select("id").distinct().count() == 2) // unique ids

    val hasId = csv("ID,name\n7,ann\n8,bob\n")
    val p2 = Save.ingest(spark, hasId, wh, "t_has_id", Seq("ID", "name"),
      Map("ID" -> "INTEGER"))
    val df2 = spark.read.parquet(p2)
    assert(!df2.columns.map(_.toLowerCase).count(_ == "id").equals(2))
    assert(df2.columns.toSeq == Seq("ID", "name")) // no synthetic column
  }

  test("declared types are applied via TypeMapper") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = csv("id,amount,n\n1,12.50,9\n")
    val out = Save.ingest(spark, p, wh, "typed", Seq("id", "amount", "n"),
      Map("id" -> "BIGINT", "amount" -> "NUMERIC(18,2)", "n" -> "INTEGER"))
    val df = spark.read.parquet(out)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("amount").dataType == DecimalType(18, 2))
  }

  test("non-coercible cells become null (try_cast), not a mid-write abort") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = csv("id,amount\n1,12.50\n2,not-a-number\n3,7\n")
    val out = Save.ingest(spark, p, wh, "badcell", Seq("id", "amount"),
      Map("id" -> "BIGINT", "amount" -> "NUMERIC(18,2)"))
    val rows = spark.read.parquet(out).orderBy("id")
      .select("amount").collect().map(r => Option(r.get(0)))
    assert(rows.toSeq == Seq(
      Some(new java.math.BigDecimal("12.50")), None,
      Some(new java.math.BigDecimal("7.00"))))
  }

  test("headers with dots/backticks survive ingestion (quoted col refs)") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = csv("price.usd,qty`x\n1.5,2\n3.0,4\n")
    val out = Save.ingest(spark, p, wh, "dotted",
      Seq("price.usd", "qty`x"), Map("price.usd" -> "DOUBLE"))
    val df = spark.read.parquet(out)
    assert(df.columns.toSeq == Seq("id", "price.usd", "qty`x"))
    assert(df.agg(org.apache.spark.sql.functions
      .sum(graft.ops.Cleanse.colRef("price.usd"))).head.getDouble(0) == 4.5)
  }

  test("K1 guard: duplicate save rejected; staging dir cleaned") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = csv("a,b\n1,2\n")
    Save.ingest(spark, p, wh, "dup", Seq("a"))
    val e = intercept[IllegalStateException] {
      Save.ingest(spark, p, wh, "dup", Seq("a"))
    }
    assert(e.getMessage.contains("already exists"))
    val ls = new java.io.File(wh).list().toSeq
    assert(!ls.exists(_.contains("graft_staging_")))
  }

  test("unknown selected columns are skipped like the reference (index.js:223)") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = csv("a,b\n1,2\n")
    val out = Save.ingest(spark, p, wh, "skipcols", Seq("a", "ghost"))
    assert(spark.read.parquet(out).columns.toSeq == Seq("id", "a"))
  }

  test("partitioned write prunes partitions on read") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("v", "par")
    Save.savePartitioned(df, dir, Seq("par"), maxRecordsPerFile = 10)
    val read = spark.read.parquet(dir).filter(col("par") === "even")
    assert(read.count() == 50)
    // partition pruning: only the even directory is listed in the scan
    val scan = read.queryExecution.executedPlan.toString
    assert(!scan.contains("par=odd"))
  }

  test("bucketed tables join without an exchange") {
    import org.apache.spark.sql.functions._
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "vb")
    Save.saveBucketed(a, "bkt_a", "k", 4, sortCol = Some("k"))
    Save.saveBucketed(b, "bkt_b", "k", 4, sortCol = Some("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact rewrites many small files into few, preserving rows") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(10000).toDF("v").repartition(40).write.parquet(dir)
    val before = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    assert(before >= 40)
    val n = Save.compact(spark, dir, targetFileBytes = 512L * 1024)
    val after = new java.io.File(dir).list().count(_.endsWith(".parquet"))
    assert(after == n && after < before)
    val df = spark.read.parquet(dir)
    assert(df.count() == 10000)
    assert(df.agg(sum(col("v"))).head.getLong(0) == 10000L * 9999 / 2)
  }

  private def derbyProps = {
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby_spec.log")
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("K3 saveJdbc round-trips rows through embedded Derby") {
    val url = "jdbc:derby:memory:graftspec;create=true"
    val df = Seq((1L, "ann", 10.5), (2L, "bob", -3.25)).toDF("id", "name", "bal")
    Save.dropJdbcTableIfExists(url, derbyProps, "people")
    Save.saveJdbc(df, url, "people", derbyProps)
    val back = spark.read.jdbc(url, "people", derbyProps)
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "ann", 10.5), (2L, "bob", -3.25)))
    // K1 guard at the writer: second save into the same table errors
    intercept[Exception] { Save.saveJdbc(df, url, "people", derbyProps) }
  }

  test("K4 saveJdbcTransactional: staging + rename publish, 409 on existing") {
    val url = "jdbc:derby:memory:graftspec;create=true"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    Save.dropJdbcTableIfExists(url, derbyProps, "txn_target")
    Save.dropJdbcTableIfExists(url, derbyProps, "graft_stg_txn_target")
    Save.saveJdbcTransactional(df, url, "txn_target", derbyProps)
    assert(spark.read.jdbc(url, "txn_target", derbyProps).count() == 2)
    // staging no longer exists after the rename publish
    assert(!Save.jdbcTableExists(url, derbyProps, "graft_stg_txn_target"))
    // 409 parity on re-save
    val e = intercept[IllegalStateException] {
      Save.saveJdbcTransactional(df, url, "txn_target", derbyProps)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("dense smart-id yields contiguous 1..N") {
    import graft.ops.SmartId
    import org.apache.spark.sql.functions._
    val df = spark.range(100).toDF("v").repartition(7)
      .select(col("v").cast("string"))
    val out = SmartId.withSmartId(df, dense = true)
    val ids = out.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 100L))
  }
}
