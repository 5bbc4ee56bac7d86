package graft.util

import org.apache.spark.sql.SparkSession

/** Single-writer gate for read-then-append index maintenance: an
  * ATOMIC create (overwrite = false) of `<path>_append_lock` — the
  * filesystem arbitrates when two writers race, and the loser fails
  * BEFORE reading the snapshot its idempotence anti-join would
  * otherwise trust. A crash can strand the marker; the error says so,
  * and deleting it after confirming no writer is live is the recovery
  * (the data itself stays consistent — the interrupted job re-runs).
  */
object SingleWriterLock {
  def withLock[T](spark: SparkSession, path: String)(body: => T): T = {
    // the PATH'S OWN filesystem, not the default FS: an s3a:// index
    // on an hdfs-default cluster would otherwise throw "Wrong FS", and
    // a scheme-less path would put the marker on a different store
    // than the index it guards (two writers with different defaults
    // would not mutually exclude)
    val lock = new org.apache.hadoop.fs.Path(path + "_append_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stream = try fs.create(lock, false) catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"another append holds $lock (or a crashed one stranded it — " +
          "delete the marker after confirming no append is live); " +
          "concurrent appends over overlapping inputs could both pass " +
          "the idempotence anti-join and double-insert", e)
    }
    try {
      stream.writeBytes(java.time.Instant.now().toString)
      stream.close()
      body
    } finally fs.delete(lock, false)
  }
}
