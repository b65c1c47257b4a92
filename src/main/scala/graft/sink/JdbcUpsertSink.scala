package graft.sink

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame

/**
 * JDBC twin of KeyedPartitionSink: the reference's delete-then-insert sink
 * contract (S6, /root/reference/trends.go:656-662 — pre-delete the
 * (list, date, type) node, then write every row keyed by statusId,
 * :686-745) expressed as a scoped DELETE + batched INSERTs over JDBC.
 *
 * Safety model (two layers):
 *  - JOB replay: re-running a batch first deletes exactly the scope it is
 *    about to write (last-writer-wins per scope), like the reference.
 *    Scope VALUES are bound through PreparedStatement placeholders — a
 *    quote or injection attempt in a key value round-trips as data, never
 *    as SQL. (Identifiers — table and column names — come from code and
 *    schema, not from data; JDBC cannot bind them.)
 *  - TASK replay: with `keyCols` set, each task deletes its own rows BY KEY
 *    inside the same transaction that inserts them, so a retried task
 *    converges instead of duplicating its partition. Concurrent duplicate
 *    attempts (speculative execution) additionally need a PRIMARY KEY on
 *    `keyCols` so the losing transaction aborts — without one, disable
 *    speculation; with `keyCols` empty the insert stage is at-least-once
 *    at task granularity.
 *
 * Scale shape: the scope DELETE is one driver-side statement; the inserts
 * run foreachPartition with one connection and one executeBatch per
 * `batchSize` rows per partition — parallelism = partitions, bounded the
 * way the reference bounded its 100 goroutines (R3, trends.go:664-679).
 */
object JdbcUpsertSink {

  /** One disjunct of the replay scope: column = value conjuncts, values
    * bound as placeholders. An EMPTY disjunct is vacuously true — i.e.
    * `Seq(Nil)` means "delete the whole table" (full replace). */
  type Scope = Seq[(String, Any)]

  /**
   * Write `docs` into `table`, first deleting rows matching ANY of
   * `scopes` (empty `scopes` skips the delete — pure append). With
   * `keyCols` non-empty, every task also pre-deletes its own rows by key
   * in-transaction (see safety model above).
   */
  def write(docs: DataFrame, url: String, table: String,
            scopes: Seq[Scope], batchSize: Int = 500,
            maxWriteTasks: Int = 100, keyCols: Seq[String] = Nil): Unit = {
    if (scopes.nonEmpty) {
      val where = scopes.map {
        case Nil => "(1 = 1)"
        case conj => conj.map { case (c, _) => s"$c = ?" }.mkString("(", " AND ", ")")
      }.mkString(" OR ")
      val conn = DriverManager.getConnection(url)
      try {
        val ps = conn.prepareStatement(s"DELETE FROM $table WHERE $where")
        var i = 1
        scopes.foreach(_.foreach { case (_, v) => ps.setObject(i, v); i += 1 })
        ps.executeUpdate()
        ps.close()
      } finally conn.close()
    }
    val cols = docs.schema.fieldNames
    require(keyCols.forall(cols.contains),
      s"keyCols ${keyCols.mkString(",")} must be output columns")
    val keyIdx = keyCols.map(c => cols.indexOf(c))
    val placeholders = cols.map(_ => "?").mkString(", ")
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders)"
    val deleteByKeySql =
      s"DELETE FROM $table WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    docs.coalesce(maxWriteTasks).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn: Connection = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val del = if (keyIdx.nonEmpty) conn.prepareStatement(deleteByKeySql) else null
            val ps = conn.prepareStatement(insertSql)
            var n = 0
            rows.foreach { row =>
              if (del != null) {
                var j = 0
                while (j < keyIdx.length) {
                  del.setObject(j + 1, row.get(keyIdx(j)))
                  j += 1
                }
                del.addBatch()
              }
              var i = 0
              while (i < cols.length) {
                ps.setObject(i + 1, row.get(i))
                i += 1
              }
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) {
                if (del != null) del.executeBatch()
                ps.executeBatch()
              }
            }
            if (del != null) del.executeBatch()
            ps.executeBatch()
            conn.commit()
            if (del != null) del.close()
            ps.close()
          } finally conn.close()
        }
    }
  }
}
