package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Struct→JSON envelope builders for the reference's `extra` JSONB columns
  * (`src/core.py:396-409`, `src/core.py:507-520`): `{}` when every field is
  * null, else a JSON object — natively via `to_json` + `when`, replacing the
  * reference's per-row `json.dumps` lambda.
  */
object JsonCols {

  /** fields are (name, column). All-null → literal "{}". */
  def jsonEnvelope(fields: (String, Column)*): Column = {
    val allNull = fields.map(_._2.isNull).reduce(_ && _)
    val st = struct(fields.map { case (n, c) => c.as(n) }: _*)
    when(allNull, lit("{}")).otherwise(to_json(st))
  }
}
