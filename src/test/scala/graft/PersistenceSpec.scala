package graft

import java.nio.file.Files

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PersistenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("C10: model save/load round-trip preserves predictions") {
    val data = graft.tables.Tables.embeddings(spark, sf)
      .select(
        array_to_vector(col("embedding").cast("array<double>")).as("features"),
        (col("label") > 4.5).cast("double").as("label"))
    val path = Files.createTempDirectory("graft_model").toString + "/lr"
    val (orig, reloaded) = graft.ml.Persistence.roundTrip(data, path)
    val a = orig.select("prediction").collect().map(_.getDouble(0))
    val b = reloaded.select("prediction").collect().map(_.getDouble(0))
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("C9/C10: metadata sidecar round-trips next to the model artifact") {
    val path = Files.createTempDirectory("graft_meta").toString + "/m"
    val data = graft.tables.Tables.embeddings(spark, sf)
      .select(
        array_to_vector(col("embedding").cast("array<double>")).as("features"),
        (col("label") > 4.5).cast("double").as("label"))
    graft.ml.Persistence.roundTrip(data, path)
    graft.ml.Persistence.saveMeta(spark, path, "all_64", 0.9876,
      Map("estimator" -> "LogisticRegression", "regParam" -> "0.01"))
    val meta = graft.ml.Persistence.loadMeta(spark, path).head()
    assert(meta.getString(0) == "all_64")
    assert(meta.getDouble(1) == 0.9876)
    assert(meta.getMap[String, String](2)("regParam") == "0.01")
    // the artifact the sidecar describes must itself still load
    assert(graft.ml.Persistence.loadLogreg(path).getRegParam == 0.01)
  }

  test("C9: ml_model_select marks exactly the winning subset as exported") {
    val out = graft.ml.Models.mlModelSelect(spark, sf).collect()
    assert(out.length == 3)
    assert(out.head.getBoolean(2), "winner row must reference the sidecar")
    assert(out.tail.forall(!_.getBoolean(2)), "only the winner is exported")
  }

  test("Telemetry.measure reports rows and wall time") {
    val m = Telemetry.measure(
      graft.ops.Relational.qAggPricing(spark, sf))
    assert(m.wallSec > 0.0)
    assert(m.outputRows > 0L)
  }

  test("Telemetry.withObservation: in-flight metrics match a direct aggregate") {
    import org.apache.spark.sql.functions._
    // isolated session: observe initializes the session's non-serializable
    // ObservationManager, which would poison later MLlib closure
    // serialization on the shared session (see Telemetry scaladoc)
    val session = spark.newSession()
    val orders = graft.tables.Tables.orders(session, sf)
    val (instrumented, obs) = Telemetry.withObservation(orders, "dq",
      Seq(count(lit(1)).as("rows"),
        count(when(col("o_totalprice") <= 0, 1)).as("bad_price")))
    // one pass: the action below is the ONLY scan; metrics ride along
    val n = instrumented.count()
    val row = obs.get
    assert(row("rows") == n)
    assert(row("bad_price") == 0L, "synthetic prices are all positive")
  }
}
