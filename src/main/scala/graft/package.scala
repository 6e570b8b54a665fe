package object graft {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Epoch microseconds of a timestamp column. Parquet TIMESTAMP_NTZ columns
    * are cast through TIMESTAMP first (identity under the UTC session TZ the
    * engine mandates), matching DuckDB's `epoch_us(... ::TIMESTAMP)`. */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}
