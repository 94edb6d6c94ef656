package graft

import graft.io.Jdbc
import graft.pipeline.{Pipeline, PipelineContext, Runner}
import graft.pipelines.ServicePipelines
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PG special-type write path, exercised as far as the sandbox allows
  * (no PostgreSQL server here — the remaining gap is PG *server* behavior
  * only):
  *
  *  1. the EXACT DDL column list Spark's JDBC writer would emit against a
  *     PostgreSQL URL for the uuid/jsonb targets, rendered through the same
  *     `JdbcUtils.schemaString` the writer calls and pinned against the
  *     reference's `sql/init_core.sql` expectations;
  *  2. the URL decoration + cast-clause assembly that lets PG coerce
  *     strings into uuid/jsonb on INSERT;
  *  3. a Derby-EXECUTED end-to-end DAG run of the auac module cycle
  *     (pre-created tables → truncate prologue → append → S7 read-back
  *     edge → row-count/value asserts), i.e. the reference's per-run
  *     shape against a real in-process JDBC endpoint.
  */
class PgSqlAssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pgUrl = "jdbc:postgresql://host/area_core_db"

  test("createTableColumnTypes CANNOT carry JSONB/UUID — Spark's parser rejects them client-side") {
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    // Discovered by EXECUTING the path (no doc says this out loud): Spark
    // parses the createTableColumnTypes clause with its own DDL parser
    // before any database is contacted, so database-only types like JSONB
    // and UUID throw UNSUPPORTED_DATATYPE locally. Feeding pgSpecialTypes
    // through this option can never work against real PG either — the
    // failure is client-side. This pin exists so nobody re-introduces it.
    val df = Seq(("u1", "Nome", """{"FLS_21"}""", """["AzSan"]""", "cl1"))
      .toDF("id", "name", "ministerial_flows", "company_natures",
        "udo_type_classification_id")
    val e = intercept[Exception] {
      JdbcUtils.schemaString(
        JdbcDialects.get(pgUrl), df.schema, caseSensitive = false,
        Jdbc.pgCastClause(Jdbc.pgSpecialTypes("udo_types")))
    }
    assert(e.getMessage.contains("UNSUPPORTED_DATATYPE"), e.getMessage)
    // Spark-parseable width overrides (the clause's actual use) DO work:
    val ok = JdbcUtils.schemaString(
      JdbcDialects.get(pgUrl), df.schema, caseSensitive = false,
      Jdbc.pgCastClause(Map("name" -> "VARCHAR(200)")))
    assert(ok.contains("\"name\" VARCHAR(200)"), ok)
  }

  test("the working uuid/jsonb recipe: pre-created DDL + string INSERT + stringtype=unspecified") {
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    // The reference pre-creates every target with its uuid/jsonb DDL
    // (sql/init_core.sql) — Spark never creates these tables. What Spark
    // DOES send is the INSERT below: plain parameter binds, one per frame
    // column; with stringtype=unspecified on the URL, PG coerces each
    // string bind to the column's DECLARED type (uuid, jsonb) server-side.
    // Pin the exact statement the writer renders for the
    // physical_structures shape (init_core.sql:154-162).
    val df = Seq(("p1", "Struttura", "PF1", """{"area_id":"7"}""", "c1", "d1"))
      .toDF("id", "name", "code", "extra", "company_id", "district_id")
    val insert = JdbcUtils.getInsertStatement(
      "physical_structures", df.schema, None, true, JdbcDialects.get(pgUrl))
    assert(insert ==
      """INSERT INTO physical_structures ("id","name","code","extra","company_id","district_id") VALUES (?,?,?,?,?,?)""",
      insert)
    // …and the URL half of the recipe:
    assert(Jdbc.pgUrlWithUnspecifiedStrings(pgUrl)
      == s"$pgUrl?stringtype=unspecified")
    // pgSpecialTypes is the checklist of which columns DEPEND on that
    // coercion — every entry must be uuid or jsonb, nothing else.
    Jdbc.pgSpecialTypes.values.flatMap(_.values)
      .foreach(t => assert(Set("UUID", "JSONB")(t)))
  }

  test("Derby-executed auac DAG: truncate prologue, append, S7 read-back edge, re-run idempotence") {
    val conn = Jdbc.Conn("jdbc:derby:memory:graftdag;create=true", "", "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    // Pre-create the targets like init_auac.sql does for PG — quoted
    // lowercase identifiers so Spark's quoted INSERT column list matches.
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val st = c.createStatement()
      st.execute(
        """CREATE TABLE requirement_taxonomies (
          |  "id" VARCHAR(64), "name" VARCHAR(200), "is_readonly" BOOLEAN,
          |  "disabled_at" TIMESTAMP, "created_at" TIMESTAMP, "updated_at" TIMESTAMP)""".stripMargin)
      st.execute(
        """CREATE TABLE requirements (
          |  "id" VARCHAR(64), "name" VARCHAR(500), "text" VARCHAR(2000),
          |  "annotations" VARCHAR(2000), "state" VARCHAR(32),
          |  "is_required" BOOLEAN, "requirement_taxonomy_id" VARCHAR(64),
          |  "created_at" TIMESTAMP, "updated_at" TIMESTAMP,
          |  "disabled_at" TIMESTAMP, "response_type" VARCHAR(64))""".stripMargin)
    } finally c.close()

    val t0 = java.sql.Timestamp.valueOf("2020-01-15 10:00:00")
    val load = to_timestamp(lit("2024-06-01 00:00:00"))
    val tipoRequisito = Seq(("TG1", "Generale", t0, t0))
      .toDF("CLIENTID", "NOME", "CREATION", "LAST_MOD")
    val tipoSpecifico = Seq(("TS1", "Specifico A", t0, t0))
      .toDF("CLIENTID", "NOME", "CREATION", "LAST_MOD")
    val tipoRisposta = Seq(("R1", "Si/No")).toDF("CLIENTID", "NOME")
    val requisito = Seq(
      ("Q1", "Req", "testo", "note", "S", "N", "S", "Generale", "TG1", "TS1", "R1", t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "TESTO", "ANNOTATIONS", "VALIDATO", "ANNULLATO",
        "IRRINUNCIABILE", "TIPO", "ID_TIPO_REQUISITO_FK",
        "ID_TIPO_SPECIFICO_REQUISITO_FK", "ID_TIPO_RISPOSTA_FK",
        "CREATION", "LAST_MOD", "DISABLED")

    val pipes = Seq(
      new Pipeline {
        val name = "requirement_taxonomies"
        override val module = "auac"
        def run(ctx: PipelineContext): Unit = {
          Jdbc.truncate(conn, Seq("requirement_taxonomies"),
            restartIdentity = false, cascade = false)
          Jdbc.append(ServicePipelines.requirementTaxonomies(
            tipoRequisito, tipoSpecifico, load), conn, "requirement_taxonomies")
        }
      },
      new Pipeline {
        val name = "requirements"
        override val module = "auac"
        // the S7 edge: the fallback-taxonomy scalar comes from the LOADED
        // target read back over JDBC (src/auac.py:150), not from the
        // upstream source frames
        override val dependsOn = Seq("requirement_taxonomies")
        def run(ctx: PipelineContext): Unit = {
          Jdbc.truncate(conn, Seq("requirements"),
            restartIdentity = false, cascade = false)
          val tax = Jdbc.readTable(ctx.spark, conn, "requirement_taxonomies")
          Jdbc.append(ServicePipelines.requirements(
            requisito, tipoRisposta, tax, load), conn, "requirements")
        }
      })

    // TWO full cycles: the truncate prologue must make the re-run
    // idempotent (the reference's standard per-run shape) — without it the
    // second append would double every row.
    (1 to 2).foreach { _ =>
      val results = Runner.run(PipelineContext(spark), pipes, Set("auac"))
      assert(results.map(_.name) == Seq("requirement_taxonomies", "requirements"))
    }
    val tax = Jdbc.readTable(spark, conn, "requirement_taxonomies")
    assert(tax.count() == 3, "generale + specifico + minted fallback, no re-run doubling")
    assert(tax.filter(col("name") === "-").count() == 1, "the fallback row the S7 edge serves")
    val req = Jdbc.readTable(spark, conn, "requirements")
    assert(req.count() == 1)
    val row = req.head()
    assert(row.getAs[String]("response_type") == "SI_NO")
    // the FK is the RAW upstream value (the pipeline does not normalize
    // this column — reference parity), so it is TG1, not tg1
    assert(row.getAs[String]("requirement_taxonomy_id") == "TG1",
      "TIPO=generale routes to the generale taxonomy FK, not the fallback")
    assert(row.getAs[String]("state") == "VALIDATO")
  }
}
