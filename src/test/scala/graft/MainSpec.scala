package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** CLI smoke (reference `main.py:26-45`): arg parsing, module dispatch over
  * the DAG runner, and one end-to-end run of the bundled parquet-seam
  * registry against Oracle-shaped fixtures — every target table lands. */
class MainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseArgs: defaults, module lists, unknown flags/modules fail fast") {
    val known = Set("core", "poa", "cronos", "auac")
    assert(Main.parseArgs(Array.empty, known).modules == Set("all"))
    assert(Main.parseArgs(Array("--modules", "Core, AUAC"), known).modules ==
      Set("core", "auac"), "lowercased + trimmed, like the reference")
    assert(Main.parseArgs(Array("--list"), known).list)
    intercept[IllegalArgumentException](Main.parseArgs(Array("--modules", "nope"), known))
    intercept[IllegalArgumentException](Main.parseArgs(Array("--frobnicate"), known))
    intercept[IllegalArgumentException](Main.parseArgs(Array("--modules"), known))
  }

  test("registry order is a valid topological order with users after companies") {
    val pipes = graft.pipeline.Runner.order(Main.registry("/in", "/out"))
    val names = pipes.map(_.name)
    assert(names.toSet == Set("toponyms", "companies", "resolutions", "udo_types",
      "specialties", "users", "requirements", "procedures", "healthcare_companies",
      "operational_offices", "udos", "udo_status_history", "poa_truncate"))
    assert(names.indexOf("companies") < names.indexOf("users"))
    assert(names.indexOf("udos") < names.indexOf("udo_status_history"),
      "history's read-back validation needs the loaded udos target")
    assert(pipes.filter(_.module == "auac").map(_.name).toSet ==
      Set("requirements", "procedures"))
    assert(pipes.filter(_.module == "cronos").map(_.name) == Seq("healthcare_companies"))
    assert(pipes.filter(_.module == "poa").map(_.name) == Seq("poa_truncate"))
  }

  test("end-to-end dispatch: all five pipelines run off parquet fixtures") {
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    val in = java.nio.file.Files.createTempDirectory("graft-cli-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-cli-out").toString
    def put(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$in/$name.parquet")

    put("toponimo_templ", Seq(("T1", "Via Roma", t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "CREATION", "LAST_MOD", "DISABLED"))
    put("titolare_model", Seq(
      ("C1", "Osp. Alfa", "Alfa srl", "spa", "CF1", "IVA1", "TR1", "N1", "027042", t0, t0, "N"))
      .toDF("CLIENTID", "DENOMINAZIONE", "RAG_SOC", "FORMA_SOCIETARIA", "CFISC",
        "PIVA", "ID_TIPO_RICH_FK", "ID_NATURA_FK", "COD_COMUNE_ESTESO",
        "CREATION", "LAST_MOD", "DISABLED"))
    put("tipologia_richiedente", Seq(("tr1", "Pubblico")).toDF("CLIENTID", "NOME"))
    put("natura_titolare_templ", Seq(("n1", "AzSan")).toDF("CLIENTID", "NOME"))
    put("municipalities", Seq(("027042", 42L, "Venezia")).toDF("istat_code", "id", "name"))
    put("delibera_templ", Seq(
      ("D1", "Delibera annuale", "TD1", "payload-1".getBytes, t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "ID_TIPO_FK", "ALLEGATO", "CREATION", "LAST_MOD", "DISABLED"))
    put("tipo_delibera", Seq(("td1", "Del. Tipo A")).toDF("CLIENTID", "NOME"))
    put("atto_model", spark.createDataFrame(
      java.util.Arrays.asList(Row("A1", "2024", "7", "TA1", t0, t0, "N")),
      StructType(Seq(
        StructField("CLIENTID", StringType), StructField("ANNO", StringType),
        StructField("NUMERO", StringType), StructField("ID_TIPO_FK", StringType),
        StructField("CREATION", TimestampType), StructField("LAST_MOD", TimestampType),
        StructField("DISABLED", StringType)))))
    put("tipo_atto", Seq(("ta1", "Atto Tipo B")).toDF("CLIENTID", "DESCR"))
    put("tipo_udo_22_templ", Seq(
      ("T1", "Tipo Uno", "C1", "NC1", "SET", "TGT", "K1", "S", "N", "Y", t0, t0, "N"))
      .toDF("CLIENTID", "DESCR", "CODICE_UDO", "NOME_CODICE_UDO", "SETTING",
        "TARGET", "ID_CLASSIFICAZIONE_UDO_FK", "OSPEDALIERO", "SALUTE_MENTALE",
        "POSTI_LETTO", "CREATION", "LAST_MOD", "DISABLED"))
    put("bind_tipo_22_ambito", Seq(("T1", "A1")).toDF("ID_TIPO_22_FK", "ID_AMBITO_FK"))
    put("ambito_templ", Seq(
      ("a1", "Ambito Uno", "Descr", "S", "N", "N", "N", "N", "N", "N", "N"))
      .toDF("CLIENTID", "NOME", "DESCR", "AGGIUNGI_DISCIPLINE",
        "AGGIUNGI_DISCIPLINE_AZ_SAN", "AGGIUNGI_DISCIPLINE_PUB_PRIV",
        "AGGIUNGI_BRANCHE", "AGGIUNGI_BRANCHE_AZ_SAN", "AGGIUNGI_BRANCHE_PUB_PRIV",
        "AGGIUNGI_PRESTAZIONI", "AGGIUNGI_AMBITO"))
    put("bind_tipo_22_natura", Seq(("T1", "N1")).toDF("ID_TIPO_UDO_22_FK", "ID_NATURA_FK"))
    put("bind_tipo_22_flusso", Seq(("T1", "F1")).toDF("ID_TIPO_UDO_22_FK", "ID_FLUSSO_FK"))
    put("flusso_templ", Seq(("f1", "FLS 21")).toDF("CLIENTID", "NOME"))
    put("utente_model", spark.createDataFrame(
      java.util.Arrays.asList(Row("U1", "AN1", "mrossi", "region", "MANUALE", "UO-7", null)),
      StructType(Seq(
        StructField("CLIENTID", StringType), StructField("ID_ANAGR_FK", StringType),
        StructField("USERNAME_CAS", StringType), StructField("RUOLO", StringType),
        StructField("PROVENIENZA_UO", StringType), StructField("ID_UO", StringType),
        StructField("DATA_DISABILITATO", TimestampType)))))
    put("anagrafica_utente_model", Seq(
      ("AN1", "Mario", "Rossi", "CF-M", "m@x.it", "1980-01-02", "Via A", "3",
        "041", "333", "ID1", "2030-01-01", "Medico", "027042", t0, t0))
      .toDF("CLIENTID", "NOME", "COGNOME", "CFISC", "EMAIL", "DATA_NASCITA",
        "VIA_PIAZZA", "CIVICO", "TELEFONO", "CELLULARE", "CARTA_IDENT_NUM",
        "CARTA_IDENT_SCAD", "PROFESSIONE", "COD_LUOGO_NASCITA", "CREATION", "LAST_MOD"))
    put("uo_model", Seq(("OU7", "UO-7")).toDF("CLIENTID", "ID_UO"))
    put("disciplina_templ", Seq(
      ("D1", "Chirurgia", 3, "dd", "Osp", "C10", 1, 0, "RG1", "77", t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "ORDINE", "DESCR", "TIPO", "CODICE",
        "PROGRAMMAZIONE", "POA", "ID_RAGG_DISCIPL_TEMPL_FK", "ID_DISCIPLINA",
        "CREATION", "LAST_MOD", "DISABLED"))
    put("branca_templ", Seq(
      ("B1", "Cardiologia", "d", "C01", 1, "10", "N", t0, t0, "N"),
      ("B2", "Altro", "d", "C99", 0, "99", "S", t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "DESCR", "CODICE", "PROGRAMMAZIONE",
        "ID_BRANCA", "IS_ALTRO", "CREATION", "LAST_MOD", "DISABLED"))
    put("artic_branca_altro_templ", Seq(("A1", "Artic", "S1", t0, t0, "N"))
      .toDF("CLIENTID", "DESCR", "SETTING_BRANCA", "CREATION", "LAST_MOD", "DISABLED"))
    put("requisito_templ", Seq(
      ("Q1", "Req", "testo", "note", "S", "N", "S", "Generale", "TG1", "TS1", "R1", t0, t0, "N"))
      .toDF("CLIENTID", "NOME", "TESTO", "ANNOTATIONS", "VALIDATO", "ANNULLATO",
        "IRRINUNCIABILE", "TIPO", "ID_TIPO_REQUISITO_FK",
        "ID_TIPO_SPECIFICO_REQUISITO_FK", "ID_TIPO_RISPOSTA_FK",
        "CREATION", "LAST_MOD", "DISABLED"))
    put("tipo_risposta", Seq(("R1", "Si/No")).toDF("CLIENTID", "NOME"))
    put("requirement_taxonomies", Seq((9L, "-")).toDF("id", "name"))
    put("domanda_inst", Seq(
      ("P1", "D-1", "CU-1", "CO1", "TP1", "IN CORSO", t0, 30, 60, "N-1", t0, t0))
      .toDF("CLIENTID", "ID_DOMANDA", "CODICE_UNIVOCO_NRECORD", "ID_TITOLARE_FK",
        "ID_TIPO_PROC_FK", "STATO", "DATA_CONCLUSIONE", "DURATA_PROCEDIMENTO",
        "MASSIMA_DURATA_PROCEDIMENTO", "NUMERO_PROCEDIMENTO", "CREATION", "LAST_MOD")
      .withColumn("DATA_INVIO_DOMANDA", col("CREATION"))
      .withColumn("DATA_SCADENZA", col("CREATION")))
    put("tipo_proc_templ", Seq(("TP1", "Autorizzazione")).toDF("CLIENTID", "DESCR"))
    put("azienda_sanitaria", Seq(("HC1", "501", "ULSS Prima"))
      .toDF("CLIENTID", "CODICE", "DESCRIZIONE"))
    put("ulss", Seq((7L, "501")).toDF("id", "code"))
    put("sede_oper_model", Seq(
      ("SO1", "ST1", "Sede Uno", "Via C", "9", "30100", "S", "027042", "TPF1",
        "45.4375", "12.3358", "TOP1", t0, t0, "N"))
      .toDF("CLIENTID", "ID_STRUTTURA_FK", "DENOMINAZIONE", "VIA_PIAZZA",
        "CIVICO", "CAP", "FLAG_INDIRIZZO_PRINCIPALE", "ISTAT",
        "ID_TIPO_PUNTO_FISICO_FK", "LATITUDINE", "LONGITUDINE",
        "ID_TOPONIMO_FK", "CREATION", "LAST_MOD", "DISABLED"))
    put("tipo_punto_fisico_templ", Seq(("TPF1", "Sede Operativa"))
      .toDF("CLIENTID", "NOME"))
    put("struttura_model", Seq(("ST1", "C1")).toDF("CLIENTID", "ID_TITOLARE_FK"))
    // 27 columns > Tuple22: build the UDO fixture from a narrow base
    put("udo_model", Seq(
      ("UD1", "Udo Uno", "Attiva", "U-1", "T1", "SO1", "ED1", "2"))
      .toDF("CLIENTID", "DESCR", "STATO", "ID_UNIVOCO", "ID_TIPO_UDO_22_FK",
        "ID_SEDE_FK", "ID_EDIFICIO_STR_FK", "PIANO")
      .withColumn("BLOCCO", lit("-")).withColumn("PROGRESSIVO", lit("P1"))
      .withColumn("CODICE_FLUSSO_MINISTERIALE", lit("F1"))
      .withColumn("COD_FAR_FAD", lit("FF")).withColumn("SIO", lit("Y"))
      .withColumn("STAREP", lit("SR")).withColumn("CDC", lit("CC"))
      .withColumn("PAROLE_CHIAVE", lit("k")).withColumn("ANNOTATIONS", lit("n"))
      .withColumn("WEEK", lit("N")).withColumn("AUAC", lit(1))
      .withColumn("FLAG_MODULO", lit("N"))
      .withColumn("PROVENIENZA_UO", lit("MANUALE"))
      .withColumn("ID_UO", lit("UO-7"))
      .withColumn("EROGAZIONE_DIRETTA", lit("Y"))
      .withColumn("EROGAZIONE_INDIRETTA", lit("N"))
      .withColumn("CREATION", lit(t0)).withColumn("LAST_MOD", lit(t0))
      .withColumn("DISABLED", lit("N")))
    put("stato_udo", Seq(
      ("SU1", "UD1", "AUTORIZZATA/ACCREDITATA", t0, t0, t0, t0),
      ("SU2", "GHOST", "NUOVA", t0, t0, t0, t0)) // orphan -> read-back drop
      .toDF("CLIENTID", "ID_UDO_FK", "STATO", "SCADENZA", "DATA_INIZIO",
        "CREATION", "LAST_MOD"))
    put("storico_posti_letto", Seq(("SU1", "12", "2", "0"))
      .toDF("ID_STATO_UDO_FK", "PL", "PLEX", "PLOB"))

    val results = Main.execute(
      Main.Args(Set("all"), list = false, Some(in), Some(out)), spark)
    assert(results.map(_.name).toSet ==
      Set("toponyms", "companies", "resolutions", "udo_types", "specialties",
        "users", "requirements", "procedures", "healthcare_companies",
        "operational_offices", "udos", "udo_status_history", "poa_truncate"))

    def readOut(t: String) = spark.read.parquet(s"$out/$t.parquet")
    assert(readOut("toponyms").count() == 1)
    assert(readOut("companies").head().getAs[String]("company_form") == "SPA")
    val res = readOut("resolutions")
    assert(res.count() == 2, "delibera + atto branches")
    assert(res.filter(col("object_key").isNotNull).count() == 1,
      "the delibera's attachment uploaded")
    val udo = readOut("udo_types").head()
    assert(udo.getAs[String]("ministerial_flows") == "{\"FLS_21\"}")
    assert(readOut("users").head().getAs[String]("role") == "REGIONAL_OPERATOR")
    assert(readOut("specialties").count() == 4, "2 branches + 1 artic + 1 discipline")
    assert(readOut("requirements").head().getAs[String]("response_type") == "SI_NO")
    assert(readOut("procedures").head().getAs[String]("procedure_type") == "AUTORIZZAZIONE")
    assert(readOut("healthcare_companies").head().getAs[Long]("ulss_id") == 7L)
    val oo = readOut("operational_offices").head()
    assert(oo.getAs[Long]("municipality_id") == 42L
      && oo.getAs[String]("physical_point_type") == "Sede Operativa")
    assert(oo.getAs[java.math.BigDecimal]("lat").toPlainString == "45.44",
      "lat rounds HALF_UP to the target's numeric(8,2)")
    val udoRow = readOut("udos").head()
    assert(udoRow.getAs[String]("company_id") == "c1",
      "the derived sede JOIN struttura company map resolves")
    assert(udoRow.getAs[String]("operational_unit_id") == "ou7")
    assert(udoRow.isNullAt(udoRow.fieldIndex("block")), "'-' placeholder nulls")
    val hist = readOut("udo_status_history")
    assert(hist.count() == 1, "the orphan history row drops via read-back validation")
    val h = hist.head()
    assert(h.getAs[String]("status") == "AUTORIZZATA" && h.getAs[Int]("beds") == 12
      && h.getAs[Boolean]("is_direct_supply"))
    assert(!hist.columns.contains("hist_id") && !hist.columns.contains("id"),
      "target id is dropped — PG generates fresh UUIDs")

    // module dispatch: auac alone runs exactly its two pipelines
    val auacOnly = Main.execute(
      Main.Args(Set("auac"), list = false, Some(in), Some(out)), spark)
    assert(auacOnly.map(_.name).toSet == Set("requirements", "procedures"))
  }
}
