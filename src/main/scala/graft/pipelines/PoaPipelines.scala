package graft.pipelines

import graft.io.Jdbc

/** The poa module (`src/poa.py`) — currently pure truncate parity: the
  * reference's `migrate_poa` only truncates the 16 POA-service target
  * tables (`src/poa.py:5-22,28-52`) and loads nothing (its migrations are
  * still TODO upstream). Re-expressed here as the same table list wired
  * into the shared K2 truncate prologue, so the CLI's `--modules poa`
  * dispatch does exactly what the reference does — and when the upstream
  * pipelines land, they slot in as [[graft.pipeline.Pipeline]]s that
  * depend on the truncate step.
  */
object PoaPipelines {

  /** `POA_TABLES` (`src/poa.py:5-22`), verbatim order. */
  val tables: Seq[String] = Seq(
    "areas",
    "function_diagram_nodes",
    "function_diagrams",
    "legal_inquiries",
    "legal_inquiries_types",
    "models",
    "node_types",
    "nodes",
    "notifications",
    "organigram_attachments",
    "organigram_emails",
    "organigrams",
    "parameters",
    "rule_types",
    "rules",
    "sub_areas")

  /** DB-backed truncate: the reference's per-table
    * `TRUNCATE TABLE t RESTART IDENTITY CASCADE` (`src/utils.py:242`) on
    * the poa sink connection — one statement connection for all 16, same
    * engine the loads would use (the discipline that kills the reference's
    * auac engine-mismatch bug, see [[graft.io.Jdbc.truncate]]). */
  def truncate(conn: Jdbc.Conn): Unit = Jdbc.truncate(conn, tables)
}
