package graft

import graft.io.Jdbc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's DDL constraint surface, EXECUTED instead of asserted.
  *
  * `sql/init_core.sql:95-106,519-520` guards every load with PK / NOT
  * NULL / UNIQUE / FK constraints — a dirty frame the pipeline failed to
  * clean is REJECTED by the database, not silently stored. No PostgreSQL
  * server exists in this sandbox, so the same constraint chain
  * (provinces → municipalities: PK id, NOT NULL name/istat_code,
  * UNIQUE istat_code, FK province_id → provinces.id) is created in
  * embedded Derby — a real JDBC endpoint that enforces all four
  * constraint classes with the same semantics — and each violation class
  * is driven through the ACTUAL writer path (`Jdbc.append`, the same
  * Spark JDBC writer production uses) and must surface as a loud failure
  * naming the constraint.
  */
class ConstraintGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conn = Jdbc.Conn("jdbc:derby:memory:graftddl;create=true", "", "",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val ddl: Unit = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val st = c.createStatement()
      // init_core.sql:76-86 (provinces) and :95-106 (municipalities),
      // uuid columns carried as VARCHAR(36) — the constraint algebra, not
      // the PG type system, is what this spec executes.
      st.execute(
        """CREATE TABLE provinces (
          |  "id" VARCHAR(36) NOT NULL,
          |  "name" VARCHAR(200) NOT NULL,
          |  CONSTRAINT pk_provinces PRIMARY KEY ("id"))""".stripMargin)
      st.execute(
        """CREATE TABLE municipalities (
          |  "id" VARCHAR(36) NOT NULL,
          |  "name" VARCHAR(200) NOT NULL,
          |  "istat_code" VARCHAR(32) NOT NULL,
          |  "province_id" VARCHAR(36) NOT NULL,
          |  CONSTRAINT pk_municipalities PRIMARY KEY ("id"),
          |  CONSTRAINT unique_municipalities_istat_code UNIQUE ("istat_code"),
          |  CONSTRAINT fk_municipalities_province_id
          |    FOREIGN KEY ("province_id") REFERENCES provinces ("id"))""".stripMargin)
      st.execute("""INSERT INTO provinces VALUES ('p1', 'Verona'), ('p2', 'Vicenza')""")
    } finally c.close()
  }

  /** Every message in the failure's cause chain, flattened — the writer
    * wraps the database's SQLException in task/job layers. */
  private def chainMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  private def mun(rows: (String, String, String, String)*) =
    rows.toDF("id", "name", "istat_code", "province_id")

  test("clean load passes the executed constraint gate") {
    ddl
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    Jdbc.append(mun(("m1", "Bussolengo", "023015", "p1"),
      ("m2", "Sona", "023083", "p1"), ("m3", "Thiene", "024105", "p2")),
      conn, "municipalities")
    assert(Jdbc.readTable(spark, conn, "municipalities").count() == 3)
  }

  test("NOT NULL rejection: a null istat_code the pipeline failed to fill is refused") {
    ddl
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    val dirty = mun(("m1", "Bussolengo", "023015", "p1"))
      .unionAll(Seq(("m9", "Dirty")).toDF("id", "name")
        .select(col("id"), col("name"),
          lit(null).cast("string").as("istat_code"), lit("p1").as("province_id")))
    val e = intercept[Throwable](Jdbc.append(dirty, conn, "municipalities"))
    assert(chainMessages(e).toLowerCase.contains("null"), chainMessages(e))
  }

  test("UNIQUE rejection: a duplicate istat_code names its constraint") {
    ddl
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    val dirty = mun(("m1", "Bussolengo", "023015", "p1"),
      ("m2", "Bussolengo Copy", "023015", "p1"))
    val e = intercept[Throwable](Jdbc.append(dirty, conn, "municipalities"))
    assert(chainMessages(e).toUpperCase.contains("UNIQUE_MUNICIPALITIES_ISTAT_CODE"),
      chainMessages(e))
  }

  test("FK rejection: a province_id with no parent row names its constraint") {
    ddl
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    val dirty = mun(("m1", "Bussolengo", "023015", "p404"))
    val e = intercept[Throwable](Jdbc.append(dirty, conn, "municipalities"))
    assert(chainMessages(e).toUpperCase.contains("FK_MUNICIPALITIES_PROVINCE_ID"),
      chainMessages(e))
  }

  test("after a rejected batch, a corrected re-run loads clean (the reference's retry shape)") {
    ddl
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    intercept[Throwable](
      Jdbc.append(mun(("m1", "Bussolengo", "023015", "p404")), conn, "municipalities"))
    // truncate prologue + clean batch — exactly the reference's re-run path
    Jdbc.truncate(conn, Seq("municipalities"), restartIdentity = false, cascade = false)
    Jdbc.append(mun(("m1", "Bussolengo", "023015", "p1")), conn, "municipalities")
    assert(Jdbc.readTable(spark, conn, "municipalities").count() == 1)
  }
}
