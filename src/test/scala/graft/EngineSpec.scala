package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.engine.{EngineException, QueryRequest, SparkEngine}
import graft.sources.Lake

/** SURVEY §2.A contracts: envelope (A5), default limit (A3), warm flag
  * (A2), serializer (A4), and the uniform error surface (A7 /
  * quack.py:65-68).
  */
class EngineSpec extends SparkSpec {

  private lazy val engine = {
    val e = SparkEngine.wrap(spark)
    Lake.registerAll(spark, SfDir)
    e
  }

  test("default limit is 20 (app.py:9) and envelope fields are present") {
    val resp = engine.execute(QueryRequest("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey"))
    assert(resp.records.size == 20)
    assert(resp.metadata.query.startsWith("SELECT l_orderkey"))
    assert(resp.metadata.eventId.nonEmpty)
    assert(resp.metadata.timeMs >= 0)
    assert(resp.metadata.epochMs > 0)
  }

  test("engine SQL dialect includes the native cosine_sim (extension bootstrap)") {
    // a SQL-only user of the engine can call the library's native
    // expression without touching the Scala Column API
    val resp = engine.execute(QueryRequest(
      "SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c"))
    assert(resp.records.head("c") == 1.0, s"got ${resp.records.head}")
  }

  test("explicit limit caps rows") {
    val resp = engine.execute(QueryRequest("SELECT l_orderkey FROM lineitem", Some(3)))
    assert(resp.records.size == 3)
  }

  test("envelope carries the result's column order (CLI renders without re-executing)") {
    val resp = engine.execute(
      QueryRequest("SELECT l_partkey AS b, l_orderkey AS a FROM lineitem", Some(1)))
    assert(resp.columns == Seq("b", "a"))
  }

  test("warm flag flips after first use (app.py:8,:32-41)") {
    val cold = new SparkEngine(() => spark)
    assert(!cold.isWarm)
    val first = cold.execute(QueryRequest("SELECT 1 AS one"))
    assert(!first.metadata.warm)
    val second = cold.execute(QueryRequest("SELECT 1 AS one"))
    assert(second.metadata.warm)
  }

  test("parse errors surface as EngineException (quack.py:65-68)") {
    val e = intercept[EngineException] {
      engine.execute(QueryRequest("SELEKT broken FROM nowhere"))
    }
    assert(e.message != null)
  }

  test("analysis errors (missing table) surface as EngineException") {
    intercept[EngineException] {
      engine.execute(QueryRequest("SELECT * FROM no_such_table_xyz"))
    }
  }

  test("non-positive limit is rejected as EngineException") {
    intercept[EngineException] {
      engine.execute(QueryRequest("SELECT 1", Some(0)))
    }
  }

  test("empty query returns empty result set with metadata (app.py:47-48)") {
    val resp = engine.execute(QueryRequest("   "))
    assert(resp.records.isEmpty)
    assert(resp.metadata.eventId.nonEmpty)
  }

  test("timestamp serialization: seconds vs sub-second precision (§7.4.2)") {
    assert(SparkEngine.formatTimestamp(Timestamp.valueOf("2019-04-01 07:04:09")) ==
      "2019-04-01 07:04:09")
    val sub = Timestamp.valueOf("2019-04-01 07:04:09.123456")
    assert(SparkEngine.formatTimestamp(sub) == "2019-04-01 07:04:09.123456")
  }

  test("serializeRow stringifies timestamps/dates and keeps nulls") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("d", DateType),
      StructField("n", LongType), StructField("s", StringType)))
    val row = Row(Timestamp.valueOf("2024-01-05 10:00:00"),
      java.sql.Date.valueOf("2024-01-05"), null, "x")
    val m = SparkEngine.serializeRow(schema, row)
    assert(m("ts") == "2024-01-05 10:00:00")
    assert(m("d") == "2024-01-05")
    assert(m("n") == null)
    assert(m("s") == "x")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only status") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
    // rows-only set is intentionally small and sketch/config-flavored
    val rowsOnly = q -- o
    assert(rowsOnly.forall(n =>
      n.startsWith("x") || n == "b12_set_conf" || n == "c11_agg_approx"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
