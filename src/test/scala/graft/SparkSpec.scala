package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared per-suite SparkSession (one JVM-wide session; suites reuse it
  * via getOrCreate — Spark local sessions are cheap to share, expensive
  * to churn).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // fixed path, not createTempDirectory: every suite CLASS evaluates
    // this builder config even though getOrCreate shares one session,
    // so a per-call temp dir leaked ~36 (mostly empty) dirs per test
    // run into /tmp; a fixed path accumulates nothing
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(path: String = "sf0.001"): String = s"/root/testdata/$path"

  override protected def afterAll(): Unit = {
    // deliberately NOT stopping: other suites share the session
    super.afterAll()
  }
}
