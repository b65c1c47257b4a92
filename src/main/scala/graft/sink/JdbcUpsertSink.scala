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
    insertRows(docs, url, table, batchSize, maxWriteTasks, keyCols)
  }

  /**
   * Keyed upsert whose replay scope NEVER materializes on the driver:
   * the batch's distinct key tuples are shipped executor-side into a
   * staging table (`<table>__stage_<unique>`, created per call),
   * then ONE set-based `DELETE … WHERE EXISTS (SELECT 1 FROM staging …)`
   * clears exactly the touched keys before the insert pass. The driver
   * runs only DDL and that single DELETE statement — with 10⁶ distinct
   * keys in a batch, zero key values cross the driver (the scope-`write`
   * path above instead binds every key tuple into the DELETE's
   * placeholders, driver-side and fine for metadata-sized scopes like
   * (day, type), wrong for per-document keys).
   *
   * Replay-idempotent like the scoped path: re-running the same content
   * re-stages the same keys, re-deletes, re-inserts — last writer wins
   * per key. A crash between delete and insert is converged by the
   * replay. The staging table name is UNIQUE PER INVOCATION
   * (`<table>__stage_<n>` from a process-wide counter + a random token),
   * so two concurrent writers to the same target (two streaming queries,
   * or bench + stream) can never clobber each other's staged keys; the
   * stage is dropped in a `finally`, so only a JVM kill can leak one —
   * and a leaked stage is inert (nothing references a stale suffix).
   *
   * String keys stage as VARCHAR sized to the BATCH'S OWN max key length
   * (floor 512), so a long key widens the staging column instead of
   * aborting the batch with a Derby truncation error. Past Derby's
   * ~1024-byte index-key comfort zone the stage-key index is skipped
   * (correctness unchanged — the EXISTS probe degrades to a stage scan,
   * acceptable for the rare giant-key batch, and disclosed here).
   * Input contract: the caller passes the WHOLE batch (all rows of
   * a key), as foreachBatch does by construction.
   */
  def writeStagedKeyed(docs: DataFrame, url: String, table: String,
                       keyCols: Seq[String], batchSize: Int = 500,
                       maxWriteTasks: Int = 100): Unit = {
    require(keyCols.nonEmpty, "staged keyed upsert needs key columns")
    val cols = docs.schema.fieldNames
    require(keyCols.forall(cols.contains),
      s"keyCols ${keyCols.mkString(",")} must be output columns")
    import org.apache.spark.sql.functions.{col, length, max}
    import org.apache.spark.sql.types.StringType
    val stage = s"${table}__stage_${stageCounter.incrementAndGet()}_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val keys = docs.select(keyCols.map(col): _*).distinct()
    // derive VARCHAR widths for string keys from the batch itself — one
    // metadata-sized aggregate (one row) over the distinct-key frame
    val stringKeys = keyCols.filter(c => docs.schema(c).dataType == StringType)
    val widths: Map[String, Int] =
      if (stringKeys.isEmpty) Map.empty
      else {
        val row = keys.agg(
          max(length(col(stringKeys.head))).as(stringKeys.head),
          stringKeys.tail.map(c => max(length(col(c))).as(c)): _*).head()
        stringKeys.map(c => c -> math.max(512,
          Option(row.getAs[Any](c)).fold(0)(_.asInstanceOf[Int]))).toMap
      }
    try {
      withConn(url) { conn =>
        val st = conn.createStatement()
        val ddl = keyCols
          .map(c => s"$c ${sqlTypeFor(docs.schema(c).dataType, widths.get(c))}")
          .mkString(", ")
        st.executeUpdate(s"CREATE TABLE $stage ($ddl)")
        st.close()
      }
      insertRows(keys, url, stage, batchSize, maxWriteTasks, keyCols = Nil)
      withConn(url) { conn =>
        val st = conn.createStatement()
        // index the staged keys BEFORE the correlated delete: without it
        // the EXISTS probe is a per-row stage scan — quadratic in keys
        // (measured: 10^5×10^5 locks Derby solid); with it, one indexed
        // lookup per target row. Skipped when a string key is wider than
        // Derby's safe index-key length (see the method doc).
        if (widths.values.forall(_ <= 1024))
          st.executeUpdate(
            s"CREATE INDEX ${stage}_idx ON $stage " +
              keyCols.mkString("(", ", ", ")"))
        val on = keyCols.map(c => s"s.$c = $table.$c").mkString(" AND ")
        st.executeUpdate(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stage s WHERE $on)")
        st.close()
      }
      insertRows(docs, url, table, batchSize, maxWriteTasks, keyCols = Nil)
    } finally {
      withConn(url) { conn =>
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage")
        catch { case _: java.sql.SQLException => () } // create never ran
        st.close()
      }
    }
  }

  /** Process-wide invocation counter for unique staging-table names. */
  private val stageCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def withConn[A](url: String)(body: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try body(conn) finally conn.close()
  }

  /** Staging-column DDL types for the key columns (the VARCHAR mapping
    * sidesteps Derby's uncomparable CLOB default for StringType; its
    * width comes from the batch's max key length, floor 512). */
  private def sqlTypeFor(dt: org.apache.spark.sql.types.DataType,
                         varcharWidth: Option[Int] = None): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case BooleanType => "BOOLEAN"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case StringType => s"VARCHAR(${varcharWidth.getOrElse(512)})"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other =>
        throw new IllegalArgumentException(s"unsupported key type $other")
    }
  }

  /** The executor-side insert pass shared by every write path: one
    * connection + one executeBatch per `batchSize` rows per partition,
    * parallelism capped at `maxWriteTasks` (R3's bounded fan-out). With
    * `keyCols` non-empty each task also pre-deletes its own rows by key
    * in-transaction (task-replay convergence — see the safety model). */
  private def insertRows(docs: DataFrame, url: String, table: String,
                         batchSize: Int, maxWriteTasks: Int,
                         keyCols: Seq[String]): Unit = {
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
