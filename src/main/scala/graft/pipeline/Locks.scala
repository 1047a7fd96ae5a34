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
 * storage alone. The file carries this instance's random owner id:
 * `release()` only deletes a lock this instance still owns, so a slow
 * owner whose lock was stale-broken cannot delete the breaker's lock
 * (the mutual-exclusion violation a bare delete would allow). Locks
 * older than `staleMs` are treated as crashed owners and broken.
 */
/** Run-lock contract the orchestrator acquires around each (table,
  * infoDate) task (reference: pramen/core .../core/lock/TokenLock.scala
  * — the base trait behind its HadoopPath and JDBC variants). graft
  * ships the shared-FS [[TokenLock]] and the database-arbitrated
  * [[graft.rdb.TokenLockJdbc]]. */
trait RunLock {
  /** True if this call acquired the lock. */
  def tryAcquire(): Boolean
  /** Release only if this instance still owns the lock. */
  def release(): Unit
}

final class TokenLock(lockDir: String, token: String,
                      staleMs: Long = 4L * 3600 * 1000,
                      hadoopConf: Configuration = new Configuration()) extends RunLock {
  private val path = new Path(s"$lockDir/$token.lock")
  private val ownerId = java.util.UUID.randomUUID().toString
  private def fs = path.getFileSystem(hadoopConf)

  /** True if this call acquired the lock. */
  def tryAcquire(): Boolean = {
    fs.mkdirs(new Path(lockDir))
    if (fs.exists(path)) {
      // a concurrent release() between exists() and getFileStatus()
      // deletes the file out from under us: that means the lock is
      // FREE — fall through to the create race instead of letting the
      // FileNotFoundException fail the task (r17 review)
      val observedMtime =
        try fs.getFileStatus(path).getModificationTime
        catch { case _: java.io.FileNotFoundException => -1L }
      val age = System.currentTimeMillis() - observedMtime
      if (observedMtime >= 0 && age <= staleMs) return false
      // Re-check immediately before breaking: if another driver broke
      // this stale lock and created a FRESH one in the window since our
      // age check, the mtime changed — deleting it would destroy a live
      // lock and let two acquirers through. Only delete while the file
      // still matches the stale state we observed. (A residual race
      // remains between this check and the delete; closing it fully
      // needs a lease/rename protocol, which plain FS create/delete
      // cannot express.)
      try {
        if (fs.getFileStatus(path).getModificationTime != observedMtime) return false
        fs.delete(path, false) // break the stale lock
      } catch { case _: java.io.FileNotFoundException => () } // someone else broke it
    }
    try {
      val out = fs.create(path, false) // atomic: loser of a race gets IOException
      out.write(ownerId.getBytes("UTF-8"))
      out.close()
      true
    } catch { case _: java.io.IOException => false } // lost the race
  }

  def isLocked: Boolean = fs.exists(path)

  /** Release only if this instance still owns the lock (its id is in
    * the file); a lock stale-broken and re-acquired by someone else is
    * left alone. */
  def release(): Unit =
    if (fs.exists(path) && currentOwner().contains(ownerId)) fs.delete(path, false)

  private def currentOwner(): Option[String] =
    try {
      val in = fs.open(path)
      try {
        // read LOOP, not a single read(): a short read (legal on
        // HDFS/S3A) like "3f2a" would never equal ownerId, turning
        // release() into a silent no-op that leaves the partition
        // locked for the full staleMs window (r17 review)
        val bytes = new Array[Byte](64)
        var n = 0
        var r = in.read(bytes, 0, bytes.length)
        while (r > 0) { n += r; r = if (n < bytes.length) in.read(bytes, n, bytes.length - n) else -1 }
        if (n <= 0) None else Some(new String(bytes, 0, n, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }
}

object TokenLock {
  def forPartition(lockDir: String, table: String, infoDate: java.time.LocalDate): TokenLock =
    new TokenLock(lockDir, s"${table}_$infoDate")
}
