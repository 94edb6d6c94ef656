package graft.pipelines

import graft.io.ObjectStore
import graft.transforms.{Audit, EnumMap, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concrete reference pipelines (SURVEY §7.1 step 5), pure
  * DataFrame → DataFrame so sources/sinks stay injectable: production wires
  * `graft.io.Jdbc`, tests wire Oracle-shaped fixtures (FIXTURES.md §A).
  *
  * Three pipelines cover the reference's three structural shapes; every
  * other core/auac/cronos pipeline is one of these with different column
  * lists:
  *  - [[toponyms]] — minimal id+name+audit projection (`src/core.py:123-147`);
  *  - [[companies]] — dimension-join enrichment + enum mapping
  *    (`src/core.py:275-364`);
  *  - resolutions — branch/union/split/side-effect/join-back/rename
  *    (`src/core.py:750-1046`), decomposed into [[resolutionBranches]],
  *    [[attachMapping]], and [[disambiguateNames]] so the object-store
  *    side effect sits between plannable stages.
  */
object CorePipelines {

  /** Default audit-flag semantics: `DISABLED == 'S'` (case/space dirty).
    * Reference: `src/utils.py:388-398`. */
  private def auditCols(loadTime: Column): Seq[Column] =
    Audit.handleTimestamps(
      Audit.romeToUtc(col("CREATION")),
      Audit.romeToUtc(col("LAST_MOD")),
      lower(trim(col("DISABLED"))), "s",
      loadTime)

  /** `migrate_toponyms` (`src/core.py:123-147`): normalize id, trim name,
    * audit triple. The minimal pipeline shape (same as ulss, districts,
    * udo classifications, …). */
  def toponyms(toponimoTempl: DataFrame, loadTime: Column): DataFrame =
    toponimoTempl.select(
      Seq(
        Text.handleId(col("CLIENTID")).as("id"),
        Text.handleText(col("NOME")).as("name")) ++ auditCols(loadTime): _*)

  /** Company-form enum semantics (`src/core.py:203-218`): dirty free-text
    * legal forms normalize to a canonical enum, unmapped → OTHER. */
  val companyFormMapping: Map[String, String] = Map(
    "s.r.l." -> "SRL", "srl" -> "SRL",
    "s.p.a." -> "SPA", "spa" -> "SPA",
    "s.n.c." -> "SNC", "s.a.s." -> "SAS",
    "ditta individuale" -> "DITTA_INDIVIDUALE",
    "associazione" -> "ASSOCIAZIONE",
    "fondazione" -> "FONDAZIONE")

  /** `migrate_companies` (`src/core.py:275-364`): three chained left joins
    * onto cleaned dimensions (requester type, company nature,
    * municipalities by ISTAT code), then the wide projection with enum
    * mapping and audit triple. Dimensions broadcast — every right side is
    * a small table (SURVEY §2.5). */
  def companies(
      titolare: DataFrame, tipoRichiedente: DataFrame, natura: DataFrame,
      municipalities: DataFrame, loadTime: Column): DataFrame = {
    val tipo = tipoRichiedente.select(
      Text.handleId(col("CLIENTID")).as("tr_id"),
      Text.handleText(col("NOME")).as("business_applicant_type"))
    val nat = natura.select(
      Text.handleId(col("CLIENTID")).as("nat_id"),
      Text.handleText(col("NOME")).as("nature"))
    val mun = municipalities.select(
      trim(col("istat_code")).as("mun_istat"),
      col("id").as("municipality_id"))
    titolare
      .join(broadcast(tipo), Text.handleId(col("ID_TIPO_RICH_FK")) === col("tr_id"), "left")
      .join(broadcast(nat), Text.handleId(col("ID_NATURA_FK")) === col("nat_id"), "left")
      .join(broadcast(mun), trim(col("COD_COMUNE_ESTESO")) === col("mun_istat"), "left")
      .select(
        Seq(
          Text.handleId(col("CLIENTID")).as("id"),
          Text.handleText(col("DENOMINAZIONE")).as("name"),
          Text.handleText(col("RAG_SOC")).as("business_name"),
          EnumMap.handleEnumMapping(
            col("FORMA_SOCIETARIA"), companyFormMapping, "OTHER").as("company_form"),
          trim(col("CFISC")).as("fiscal_code"),
          trim(col("PIVA")).as("vat_number"),
          col("business_applicant_type"),
          col("nature"),
          col("municipality_id")) ++ auditCols(loadTime): _*)
      .drop("tr_id", "nat_id", "mun_istat")
  }

  /** Resolutions step 1 (`src/core.py:790-894`): the delibera and atto
    * branches, each enriched with its type dimension, unioned
    * diagonal-relaxed (missing columns → null). The atto name is the
    * reference's `ANNO-NUMERO [ID]` concat (`src/core.py:836-844` — null
    * propagates if any part is null, pinned in the spec). */
  def resolutionBranches(
      delibera: DataFrame, tipoDelibera: DataFrame,
      atto: DataFrame, tipoAtto: DataFrame, loadTime: Column): DataFrame = {
    val td = tipoDelibera.select(
      Text.handleId(col("CLIENTID")).as("td_id"),
      Text.handleText(col("NOME")).as("resolution_type"))
    val ta = tipoAtto.select(
      Text.handleId(col("CLIENTID")).as("ta_id"),
      Text.handleText(col("DESCR")).as("resolution_type"))
    val delib = delibera
      .join(broadcast(td), Text.handleId(col("ID_TIPO_FK")) === col("td_id"), "left")
      .select(
        Seq(
          Text.handleId(col("CLIENTID")).as("id"),
          Text.handleText(col("NOME")).as("name"),
          col("resolution_type"),
          col("ALLEGATO").as("attachment")) ++ auditCols(loadTime): _*)
    val atti = atto
      .join(broadcast(ta), Text.handleId(col("ID_TIPO_FK")) === col("ta_id"), "left")
      .select(
        Seq(
          Text.handleId(col("CLIENTID")).as("id"),
          concat(trim(col("ANNO")), lit("-"), trim(col("NUMERO")),
            lit(" ["), Text.handleId(col("CLIENTID")), lit("]")).as("name"),
          col("resolution_type"),
          lit(null).cast("binary").as("attachment")) ++ auditCols(loadTime): _*)
    delib.unionByName(atti, allowMissingColumns = true)
  }

  /** Resolutions step 2 (`src/core.py:895-1012`): split on attachment
    * presence, upload the with-attachment half through the object store
    * (deterministic keys, partition-level parallelism, content type from
    * the reference's MIME table — `src/core.py:709-712,938`), join the
    * id→object mapping back, and ASSERT completeness — every uploaded row
    * must have a mapping (`src/core.py:1012`). Returns the re-unioned frame
    * (`src/core.py:1014-1020`).
    *
    * Long-lived sessions should prefer [[attachMappingWithRelease]] and
    * call the release hook after the sink action — this form leaves the
    * (bounded, metadata-only) mapping cache pinned for the session. */
  def attachMapping(
      resolutions: DataFrame, bucket: String,
      clientFactory: () => ObjectStore.Client): DataFrame =
    attachMappingWithRelease(resolutions, bucket, clientFactory)._1

  /** [[attachMapping]] plus a cache-release hook.
    *
    * The upload `mapPartitions` executes exactly ONCE per run: the mapping
    * is persisted and forced by the completeness assert, so the caller's
    * sink action reads the cached (id, objectKey, nBytes) rows — never the
    * BLOBs — instead of re-running the upload. (Deterministic keys make a
    * re-run idempotent, but at 100 TB of attachments it would double the
    * upload I/O.) The cached frame is metadata-only: ~100 bytes per
    * attachment, not the payloads. Call the returned hook after the final
    * action over the frame. */
  def attachMappingWithRelease(
      resolutions: DataFrame, bucket: String,
      clientFactory: () => ObjectStore.Client): (DataFrame, () => Unit) = {
    val withA = resolutions.filter(col("attachment").isNotNull)
    val withoutA = resolutions.filter(col("attachment").isNull)
      .withColumn("object_key", lit(null).cast("string"))
    val mapping = ObjectStore.upload(
      withA.select(
        col("id"), col("name"),
        ObjectStore.contentTypeForName(col("name")).as("mime"),
        col("attachment").as("payload")),
      bucket, clientFactory).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined = withA.join(mapping.select(col("id").as("m_id"), col("objectKey")),
      col("id") === col("m_id"), "left")
    // This count both asserts completeness AND materializes the persisted
    // mapping (the join consumes every mapping partition). On the failure
    // path the caller never receives the release hook, so the cache must
    // not outlive the throw.
    try {
      val missing = joined.filter(col("objectKey").isNull).count()
      require(missing == 0, s"$missing uploaded resolutions lost their object mapping")
    } catch { case e: Throwable => mapping.unpersist(); throw e }
    val merged = joined
      .select((withA.columns.map(col) :+ col("objectKey").as("object_key")).toIndexedSeq: _*)
      .unionByName(withoutA)
    (merged, () => { mapping.unpersist(); () })
  }

  /** Resolutions step 3 (`src/core.py:1022-1043`): duplicate-name
    * disambiguation — first occurrence keeps `name`, later ones get
    * ` (n)`. The reference depends on physical row order; here the keeper
    * order is pinned deterministically by `id` (normalized CLIENTIDs are
    * unique across both branches — SURVEY §2.7's documented divergence). */
  def disambiguateNames(resolutions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("name")).orderBy(col("id"))
    resolutions
      .withColumn("rn", row_number().over(w))
      .withColumn("name",
        when(col("rn") > 1,
          concat(col("name"), lit(" ("), (col("rn") - 1).cast("string"), lit(")")))
          .otherwise(col("name")))
      .drop("rn")
  }
}
