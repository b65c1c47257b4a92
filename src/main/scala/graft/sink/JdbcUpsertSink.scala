package graft.sink

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame

/**
 * JDBC twin of KeyedPartitionSink: the reference's delete-then-insert sink
 * contract (S6, /root/reference/trends.go:656-662 — pre-delete the
 * (list, date, type) node, then write every row keyed by statusId,
 * :686-745) expressed as a scoped DELETE + batched INSERTs over JDBC.
 *
 * Replay-safe the same way the reference is: re-running a batch first
 * deletes exactly the scope it is about to write, so duplicates cannot
 * accumulate (last-writer-wins per scope). Designed for
 * `writeStream.foreachBatch { (batch, _) => JdbcUpsertSink.write(...) }` —
 * the north star's "Structured Streaming + JDBC" sink — and equally usable
 * from the batch job.
 *
 * Scale shape: the scope DELETE is one driver-side statement; the inserts
 * run foreachPartition with one connection and one executeBatch per
 * `batchSize` rows per partition — parallelism = partitions, bounded the
 * way the reference bounded its 100 goroutines (R3, trends.go:664-679).
 */
object JdbcUpsertSink {

  /**
   * Write `docs` into `table`, first deleting rows matching `scopeWhere`
   * (e.g. "list_id = 'L' AND ingest_date = '2023-01-01'"); pass an empty
   * scope to skip the delete (pure append).
   */
  def write(docs: DataFrame, url: String, table: String,
            scopeWhere: String, batchSize: Int = 500,
            maxWriteTasks: Int = 100): Unit = {
    if (scopeWhere.nonEmpty) {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.executeUpdate(s"DELETE FROM $table WHERE $scopeWhere")
        st.close()
      } finally conn.close()
    }
    val cols = docs.schema.fieldNames
    val placeholders = cols.map(_ => "?").mkString(", ")
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders)"
    docs.coalesce(maxWriteTasks).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn: Connection = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val ps = conn.prepareStatement(insertSql)
            var n = 0
            rows.foreach { row =>
              var i = 0
              while (i < cols.length) {
                ps.setObject(i + 1, row.get(i))
                i += 1
              }
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) ps.executeBatch()
            }
            ps.executeBatch()
            conn.commit()
            ps.close()
          } finally conn.close()
        }
    }
  }
}
