package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** BigQuery-style JSON schema → Spark `StructType`.
  *
  * Mirrors the reference's runtime schema loading: the Dataflow job reads a
  * JSON field list from GCS and wraps a bare list in `{"fields": [...]}`
  * (dataflow_pipeline/pipeline.py:135-141); the dimension loader builds
  * SchemaFields from the same files (update_dim_tables_cloud_function/
  * main.py:50-58). Here the parse happens once at plan time on the driver —
  * schemas are metadata, never per-row work.
  */
object SchemaLoader {

  /** `{"name":..., "type":..., "mode":...}` → StructField.
    * mode REQUIRED → nullable=false; NULLABLE/absent → nullable=true.
    */
  private def toField(name: String, bqType: String, mode: String): StructField = {
    val dt: DataType = bqType.toUpperCase match {
      case "STRING" => StringType
      case "INT64" | "INTEGER" | "INT" | "LONG" => LongType
      case "FLOAT64" | "FLOAT" | "DOUBLE" => DoubleType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "DATE" => DateType
      case "TIMESTAMP" | "DATETIME" => TimestampType
      case "NUMERIC" | "BIGNUMERIC" => DecimalType(38, 9)
      case "BYTES" => BinaryType
      case other => throw new IllegalArgumentException(s"Unsupported BQ type: $other")
    }
    StructField(name, dt, nullable = mode.toUpperCase != "REQUIRED")
  }

  /** Parse a BQ JSON schema document: either `[{field}...]` (bare list, as
    * the reference wraps) or `{"fields": [{field}...]}`.
    */
  def fromJson(json: String): StructType = {
    val parsed = JsonMethods.parse(json)
    val fields = parsed match {
      case JArray(fs) => fs
      case JObject(_) => (parsed \ "fields") match {
        case JArray(fs) => fs
        case _ => throw new IllegalArgumentException("schema object missing 'fields' array")
      }
      case _ => throw new IllegalArgumentException("schema must be a list or object")
    }
    StructType(fields.map { f =>
      val name = (f \ "name") match { case JString(s) => s; case _ => sys.error("field missing name") }
      val tpe = (f \ "type") match { case JString(s) => s; case _ => sys.error("field missing type") }
      val mode = (f \ "mode") match { case JString(s) => s; case _ => "NULLABLE" }
      toField(name, tpe, mode)
    })
  }
}
