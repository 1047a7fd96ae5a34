package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Filesystem token lock guarding concurrent pipelines writing the same
 * (table, infoDate)
 * (reference: pramen/core .../core/lock/TokenLockFactoryHadoopPath.scala,
 * core/lock/TokenLockHadoopPath.scala).
 *
 * Acquisition is an atomic `create(overwrite = false)` of a token
 * file — the same primitive works on HDFS/S3A/local FS, so two
 * drivers on different machines exclude each other through shared
 * storage alone. Locks older than `staleMs` are treated as crashed
 * owners and broken.
 */
final class TokenLock(lockDir: String, token: String,
                      staleMs: Long = 4L * 3600 * 1000) {
  private val path = new Path(s"$lockDir/$token.lock")
  private def fs = path.getFileSystem(new Configuration())

  /** True if this call acquired the lock. */
  def tryAcquire(): Boolean = {
    fs.mkdirs(new Path(lockDir))
    if (fs.exists(path)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(path).getModificationTime
      if (age <= staleMs) return false
      fs.delete(path, false) // break the stale lock
    }
    try {
      val out = fs.create(path, false)
      out.write(s"${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      out.close()
      true
    } catch { case _: java.io.IOException => false } // lost the race
  }

  def isLocked: Boolean = fs.exists(path)

  def release(): Unit = if (fs.exists(path)) fs.delete(path, false)
}

object TokenLock {
  def forPartition(lockDir: String, table: String, infoDate: java.time.LocalDate): TokenLock =
    new TokenLock(lockDir, s"${table}_$infoDate")
}
