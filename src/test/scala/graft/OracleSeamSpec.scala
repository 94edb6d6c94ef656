package graft

import java.sql.Types

import graft.io.Jdbc
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Oracle SOURCE seam (reference `src/utils.py:103,150-181`: every
  * migration's S1 scan reads Oracle tables), exercised as far as the
  * sandbox allows — no Oracle server or oracle-jdbc driver exists here
  * (nor an H2 compatibility mode: the offline ivy cache carries neither),
  * so the seam splits into two EXECUTED halves:
  *
  *  1. Spark's own `OracleDialect` — selected purely by URL scheme, so the
  *     exact dialect object production would use is obtainable and its
  *     mappings are pinned by EXECUTION (values below were probed, not
  *     transcribed from docs): unsized Oracle NUMBER widens to
  *     DECIMAL(38,10) (the "NUMBER→Decimal widening" a real migration
  *     meets first — IDs arrive as decimals, not longs, unless the DDL
  *     sized them), TIMESTAMP WITH (LOCAL) TIME ZONE lands on Catalyst
  *     TimestampType (session-TZ semantics), BINARY_FLOAT/BINARY_DOUBLE
  *     map to Float/Double, and the writer-side type/truncate renderings
  *     differ from PG in ways [[graft.io.Jdbc]] documents.
  *
  *  2. a Derby-EXECUTED partitioned `Jdbc.readTable` over an UPPER_SNAKE
  *     unquoted schema — Derby folds unquoted identifiers to upper case
  *     exactly like Oracle, so identifier-case handling, DECIMAL(p,s)
  *     arrival, and partitionColumn/bounds semantics (bounds SPLIT, never
  *     FILTER: out-of-range rows land in the edge partitions) run against
  *     a real JDBC endpoint.
  */
class OracleSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val oracleUrl = "jdbc:oracle:thin:@//db:1521/XEPDB1"

  test("jdbc:oracle URL selects OracleDialect; NUMBER/TZ mappings are the executed contract") {
    val d = JdbcDialects.get(oracleUrl)
    assert(d.getClass.getName == "org.apache.spark.sql.jdbc.OracleDialect")

    def numeric(size: Int, scale: Int) = {
      val md = new MetadataBuilder(); md.putLong("scale", scale.toLong)
      d.getCatalystType(Types.NUMERIC, "NUMBER", size, md)
    }
    // Unsized NUMBER (precision 0 as reported by the driver) and Oracle
    // FLOAT (scale -127) both widen to DecimalType(38,10): a reference
    // table whose PKs are bare `NUMBER` arrives as decimal(38,10) — any
    // downstream join against a bigint key must cast explicitly, which is
    // why CorePipelines normalizes ids to string via handleId instead of
    // trusting source integer types.
    assert(numeric(0, 0).contains(DecimalType(38, 10)))
    assert(numeric(0, -127).contains(DecimalType(38, 10)))
    assert(numeric(126, -127).contains(DecimalType(38, 10)))
    // Sized NUMBER(p,s) falls through to the generic JDBC mapping (None
    // here): precision/scale survive as-declared, e.g. NUMBER(8,2) lands
    // as decimal(8,2) — executed against Derby DECIMAL below.
    assert(numeric(10, 0).isEmpty && numeric(10, 2).isEmpty)

    // Oracle's TZ-typed timestamps (vendor codes -101/-102) both land on
    // Catalyst TimestampType — i.e. SESSION-LOCAL semantics; the audit
    // triple's Europe/Rome handling must not assume the source column
    // carried an offset. BINARY_FLOAT (100) / BINARY_DOUBLE (101) map to
    // Float/Double.
    val md0 = new MetadataBuilder(); md0.putLong("scale", 0L)
    assert(d.getCatalystType(-101, "TIMESTAMP WITH TIME ZONE", 0, md0)
      .contains(TimestampType))
    assert(d.getCatalystType(-102, "TIMESTAMP WITH LOCAL TIME ZONE", 0, md0)
      .contains(TimestampType))
    assert(d.getCatalystType(100, "BINARY_FLOAT", 0, md0).contains(FloatType))
    assert(d.getCatalystType(101, "BINARY_DOUBLE", 0, md0).contains(DoubleType))

    // Writer-side renderings a deployment must know (all executed):
    // Oracle TRUNCATE has no RESTART IDENTITY (PG-only — Jdbc.truncate's
    // flags are documented PG-dialect), StringType becomes VARCHAR2(255)
    // (NOT unbounded text: wide reference columns need explicit DDL), and
    // TimestampType writes as TIMESTAMP WITH LOCAL TIME ZONE.
    assert(d.getTruncateQuery("T1") == "TRUNCATE TABLE T1")
    assert(d.getTruncateQuery("T1", Some(true)) == "TRUNCATE TABLE T1 CASCADE")
    assert(d.getJDBCType(StringType).map(_.databaseTypeDefinition)
      .contains("VARCHAR2(255)"))
    assert(d.getJDBCType(TimestampType).map(_.databaseTypeDefinition)
      .contains("TIMESTAMP WITH LOCAL TIME ZONE"))
    assert(d.getJDBCType(BooleanType).map(_.databaseTypeDefinition)
      .contains("NUMBER(1)"))
  }

  test("Derby-executed UPPER_SNAKE partitioned scan: identifier fold, DECIMAL arrival, bounds split not filter") {
    val conn = Jdbc.Conn("jdbc:derby:memory:graftora;create=true", "", "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val st = c.createStatement()
      // UNQUOTED identifiers — Derby folds them to upper case exactly as
      // Oracle would fold the reference's anagrafica tables.
      st.execute(
        """CREATE TABLE anagrafica_sede (
          |  id_sede BIGINT, clientid VARCHAR(20),
          |  latitudine DECIMAL(8,2), creation TIMESTAMP)""".stripMargin)
      val ins = c.prepareStatement(
        "INSERT INTO anagrafica_sede VALUES (?, ?, ?, ?)")
      (0 until 10).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, s"S$i")
        ins.setBigDecimal(3, new java.math.BigDecimal(s"$i.25"))
        ins.setTimestamp(4, java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 10:00:00"))
        ins.executeUpdate()
      }
    } finally c.close()

    val df = Jdbc.readTable(spark, conn, "anagrafica_sede",
      partitionColumn = Some("ID_SEDE"), bounds = Some((2L, 7L)),
      numPartitions = 4)
    // Identifier case: the scan surfaces the folded UPPER_SNAKE names —
    // the pipelines' col("CLIENTID")/col("CREATION") references resolve
    // against exactly what an Oracle cursor reports.
    assert(df.schema.fieldNames.toSeq ==
      Seq("ID_SEDE", "CLIENTID", "LATITUDINE", "CREATION"))
    // Sized NUMBER/DECIMAL(8,2) arrives as decimal(8,2), not double.
    assert(df.schema("LATITUDINE").dataType == DecimalType(8, 2))
    // Bounds semantics: 4 parallel cursors, and rows OUTSIDE [2,7] are
    // still read (edge partitions take open ranges) — bounds split the
    // scan, they never filter it.
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 10)
    // And the misconfiguration guard: one of partitionColumn/bounds alone
    // fails fast instead of silently degrading to a single cursor.
    intercept[IllegalArgumentException] {
      Jdbc.readTable(spark, conn, "anagrafica_sede",
        partitionColumn = Some("ID_SEDE"))
    }
  }
}
