package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Schema contract between the driver-generated testdata and the engine.
  *
  * The driver regenerates the parquet tables between rounds and has
  * changed physical types while doing so (events.ts went timestamp[ns] →
  * timestamp[us] mid-round-5, which surfaced as TIMESTAMP_NTZ instead of
  * the Long nanos the whole engine assumes and failed 29 scattered
  * specs). This suite pins every type assumption the operators make
  * about the LOADED frames — one clear failure naming the drifted
  * column, instead of a storm of downstream analysis errors. If it
  * fails, extend the normalization in `Tables` (see `normalizeTs`)
  * rather than the operators.
  */
class TablesContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def check(table: String, col: String, ok: DataType => Boolean,
                    want: String)(implicit schema: StructType): Unit = {
    val f = schema.fields.find(_.name == col)
    assert(f.isDefined, s"$table.$col missing — testdata schema drifted; adapt Tables")
    assert(ok(f.get.dataType),
      s"$table.$col is ${f.get.dataType.simpleString}, engine expects $want — " +
        "testdata schema drifted; adapt the Tables normalization layer")
  }

  test("events: ts is Long epoch-nanos after load; ids exactly bigint; value double") {
    implicit val s: StructType = Tables.events(spark, sf).schema
    check("events", "ts", _ == LongType, "bigint (epoch-nanos, via normalizeTs)")
    // EXACT LongType, not merely integral: CheckpointRestart.windowedAgg
    // declares its streaming source schema with these as 'long', and a
    // narrower physical type would fail there, not here
    check("events", "event_id", _ == LongType, "bigint")
    check("events", "user_id", _ == LongType, "bigint")
    check("events", "event_type", _ == StringType, "string")
    check("events", "value", _ == DoubleType, "double")
    check("events", "props", _ == StringType, "string (JSON)")
  }

  test("lineitem: keys integral, measures double, shipdate timestamp") {
    implicit val s: StructType = Tables.lineitem(spark, sf).schema
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .foreach(check("lineitem", _, isIntegral, "integral"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .foreach(check("lineitem", _, _ == DoubleType, "double"))
    Seq("l_returnflag", "l_linestatus")
      .foreach(check("lineitem", _, _ == StringType, "string"))
    check("lineitem", "l_shipdate",
      dt => dt == TimestampType || dt == TimestampNTZType || dt == DateType,
      "timestamp/date (date_format-able)")
  }

  test("orders: keys integral, totalprice double, orderdate timestamp") {
    implicit val s: StructType = Tables.orders(spark, sf).schema
    Seq("o_orderkey", "o_custkey").foreach(check("orders", _, isIntegral, "integral"))
    check("orders", "o_totalprice", _ == DoubleType, "double")
    check("orders", "o_orderdate",
      dt => dt == TimestampType || dt == TimestampNTZType || dt == DateType,
      "timestamp/date (date_format-able)")
    Seq("o_orderstatus", "o_orderpriority")
      .foreach(check("orders", _, _ == StringType, "string"))
  }

  test("dimensions: keys integral, balances double, names string") {
    val dims = Seq(
      "customer" -> Seq("c_custkey" -> "i", "c_nationkey" -> "i",
        "c_acctbal" -> "d", "c_name" -> "s", "c_mktsegment" -> "s"),
      "supplier" -> Seq("s_suppkey" -> "i", "s_nationkey" -> "i",
        "s_acctbal" -> "d", "s_name" -> "s"),
      "part" -> Seq("p_partkey" -> "i", "p_size" -> "i",
        "p_retailprice" -> "d", "p_name" -> "s", "p_brand" -> "s", "p_type" -> "s"),
      "nation" -> Seq("n_nationkey" -> "i", "n_regionkey" -> "i", "n_name" -> "s"),
      "region" -> Seq("r_regionkey" -> "i", "r_name" -> "s"))
    dims.foreach { case (t, cols) =>
      implicit val s: StructType = Tables.load(spark, sf, t).schema
      cols.foreach {
        case (c, "i") => check(t, c, isIntegral, "integral")
        case (c, "d") => check(t, c, _ == DoubleType, "double")
        case (c, _)   => check(t, c, _ == StringType, "string")
      }
    }
  }

  test("documents/embeddings: text string, embedding array<float>") {
    implicit val d: StructType = Tables.documents(spark, sf).schema
    check("documents", "doc_id", isIntegral, "integral")
    Seq("text", "lang", "source").foreach(check("documents", _, _ == StringType, "string"))
    check("documents", "n_chars", isIntegral, "integral")
    val e = Tables.embeddings(spark, sf).schema
    check("embeddings", "vec_id", isIntegral, "integral")(e)
    check("embeddings", "embedding",
      { case ArrayType(FloatType, _) => true; case _ => false },
      "array<float>")(e)
    check("embeddings", "label", isIntegral, "integral")(e)
  }

  test("normalizeTs is idempotent and exact on both storage variants") {
    import org.apache.spark.sql.functions._
    // already-long frames pass through untouched
    val longTs = spark.range(3).select(col("id").as("ts"))
    assert(Tables.normalizeTs(longTs).schema("ts").dataType == LongType)
    assert(Tables.normalizeTs(longTs).collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // micro-precision timestamps convert ×1000 exactly (UTC session)
    val ntz = spark.range(3)
      .select(timestamp_micros(col("id") * 1000000L + 123456L)
        .cast(TimestampNTZType).as("ts"))
    val got = Tables.normalizeTs(ntz).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(123456000L, 1123456000L, 2123456000L),
      s"micros→nanos conversion drifted: $got")
  }
}
