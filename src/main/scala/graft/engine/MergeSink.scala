package graft.engine

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** What a merge updates and on which keys — the sink-facing slice of
  * the [[Importer]] contract (table name, join keys, update subset),
  * mirroring the reference's (`schema`, `table`, `join_on`, `subset`)
  * constructor state (`/root/reference/dbimport/importer.py:73-101`).
  */
final case class MergeSpec(
    table: String,
    joinOn: Seq[String],
    subset: Seq[String],
    schema: Option[String] = None)

/** S9 — where a merge's effect lands. The reference's whole purpose is
  * the server-side write-back (`importer.py:293-359`: drop/create a
  * staging temp table, chunked `executemany` of the delta, one
  * set-based `UPDATE … INNER JOIN`, commit). Spark-first, the merge
  * itself is the lazily-planned [[Importer.updated]] relation and a
  * MergeSink is the terminal operator that materializes the effect —
  * either by rewriting the table in the lake ([[ParquetMergeSink]]) or
  * by pushing the UPDATE to the origin database ([[JdbcMergeSink]]).
  * Returns the affected-row count (A4, `cur.rowcount` analogue).
  */
trait MergeSink {
  def write(merge: MergeResult, delta: DataFrame, spec: MergeSpec): Long
}

/** Data-lake sink: materialize the merged relation and rewrite the
  * table location with bounded rows per file — the chunk-size contract
  * of the reference's bulk insert carried to file granularity (S8).
  */
final class ParquetMergeSink(
    path: String, chunkSize: Int = Staging.ChunkSize
) extends MergeSink {
  override def write(
      merge: MergeResult, delta: DataFrame, spec: MergeSpec): Long = {
    Staging.writeBatched(merge.updated, path, chunkSize)
    merge.rowCountUpdated
  }
}

/** Database sink (S9 proper): re-expression of `Importer.run`
  * (`importer.py:293-359`) over JDBC. Only the DELTA travels: it is
  * streamed to the staging temp table in `chunkSize` batches
  * (`addBatch`/`executeBatch` is JDBC's array-binding analogue of
  * pyodbc's `fast_executemany`, `importer.py:298-299`) with a commit
  * per chunk (`importer.py:253-261`), then one set-based UPDATE joins
  * staging into the target server-side — the target table never
  * leaves the database, and the merged relation is never computed
  * Spark-side.
  *
  * A single connection carries the whole lifecycle because the staging
  * table is session-scoped on both dialects (`#dbimport` /
  * `temp.dbimport`); the delta therefore streams through the driver
  * via `toLocalIterator` (partition-at-a-time, never a full collect) —
  * the delta is the small side by construction (a user-supplied update
  * set). For a globally-visible staging table, the per-partition
  * parallel form (`df.write.jdbc` into staging, then the same UPDATE)
  * is the drop-in alternative.
  *
  * The connection is injected (`connect`), so the statement/batch
  * protocol is pinned offline by proxy-backed fakes in MergeSinkSpec;
  * there is no live database in this environment.
  */
final class JdbcMergeSink(
    dialect: String,
    connect: () => Connection,
    chunkSize: Int = Staging.ChunkSize
) extends MergeSink {
  SqlGen.requireDialect(dialect)

  /** The reference's staging-table name (`importer.py:16,90`). */
  private val temp: String =
    if (dialect == "mssql") "#dbimport" else "dbimport"

  private def q(n: String): String =
    Types.quoteName(n).getOrElse(
      throw new IllegalArgumentException(s"identifier too long: $n"))

  /** Quoted qualified target, `importer.py:274-276`. */
  private def qualified(spec: MergeSpec): String = dialect match {
    case "mssql" => s"${q(spec.schema.getOrElse("dbo"))}.${q(spec.table)}"
    case _       => spec.table
  }

  override def write(
      merge: MergeResult, delta: DataFrame, spec: MergeSpec): Long = {
    val cols = spec.joinOn ++ spec.subset
    val conn = connect()
    try {
      val st = conn.createStatement()
      try {
        // drop → create → fill → update → drop (importer.py:301-310)
        st.execute(SqlGen.dropTempTable(dialect, temp))
        st.execute(
          SqlGen.createTempTable(dialect, qualified(spec), temp, cols))
        val ps = conn.prepareStatement(
          SqlGen.insertInto(dialect, temp, cols))
        try JdbcMergeSink.insertBatches(ps,
          delta.select(cols.map(col): _*).toLocalIterator(),
          cols.size, chunkSize, () => conn.commit())
        finally ps.close()
        val update = dialect match {
          case "mssql" => SqlGen.updateMssql(
            spec.schema.getOrElse("dbo"), spec.table, temp,
            spec.joinOn, spec.subset)
          case _ => SqlGen.updateSqlite(
            spec.table, s"temp.$temp", spec.joinOn, spec.subset)
        }
        val affected = st.executeUpdate(update).toLong
        conn.commit()
        st.execute(SqlGen.dropTempTable(dialect, temp))
        affected
      } finally st.close()
    } finally conn.close()
  }
}

object JdbcMergeSink {

  /** Chunked `executemany` analogue (`importer.py:253-261`): bind each
    * row positionally, `executeBatch` + commit every `chunkSize` rows
    * and once more for the remainder. Null-safe: Spark nulls bind as
    * JDBC NULLs via `setObject(i, null)` (the reference's
    * `where(pd.notnull(chunk), None)`). Package-visible so the batch
    * boundaries are pinned offline by MergeSinkSpec.
    */
  private[graft] def insertBatches(
      ps: PreparedStatement, rows: java.util.Iterator[Row],
      width: Int, chunkSize: Int, commit: () => Unit): Long = {
    require(chunkSize > 0, "chunkSize must be positive")
    var total = 0L
    var inBatch = 0
    while (rows.hasNext) {
      val r = rows.next()
      var i = 0
      while (i < width) {
        ps.setObject(i + 1, r.get(i))
        i += 1
      }
      ps.addBatch()
      inBatch += 1
      total += 1
      if (inBatch == chunkSize) {
        ps.executeBatch()
        commit()
        inBatch = 0
      }
    }
    if (inBatch > 0) {
      ps.executeBatch()
      commit()
    }
    total
  }
}
