package graft.core

import java.nio.file.{Files, Path, Paths}

/** File-based single-writer lease, shared by [[graft.operators.CdcMirror]]
  * (where the pattern was battle-tested in round 15) and the collection's
  * TOC-writing maintenance ops (flush/merge/vacuum — round-15 verdict #2).
  *
  * Semantics: `acquire` CREATE_NEWs `<dir>/WRITER_LEASE` (atomic
  * fail-if-exists) and returns a token tying release/fencing to THIS
  * acquisition; a heartbeat thread refreshes the mtime every staleMs/4 so
  * a LIVE writer is never stale-taken however long its Spark jobs run; a
  * crash-orphaned lease older than `staleMs` is claimed by an ATOMIC move
  * (exactly one of N concurrent takers wins); `requireHeld` fences the
  * commit point (modulo the documented two-syscall check-then-act residue
  * — true elimination needs a CAS manifest store POSIX rename cannot
  * express); `release` deletes only a lease still carrying OUR token, so
  * a paused predecessor can never delete its successor's live lease.
  *
  * Contention is an ERROR, not a wait: these writers are single-writer by
  * contract, and the round-15 CdcMirror lesson is that documented
  * contracts must fail loudly when violated instead of silently dropping
  * a racer's work. */
private[graft] object WriterLease {

  def leasePath(dir: String): Path = Paths.get(dir, "WRITER_LEASE")

  /** Acquire or throw IllegalStateException naming the contention.
    * `what` describes the guarded resource in error messages
    * (e.g. "mirror", "collection"). */
  def acquire(dir: String, staleMs: Long, what: String): String = {
    val lp = leasePath(dir)
    val token = java.util.UUID.randomUUID().toString
    val body =
      s"pid=${ProcessHandle.current().pid()} token=$token ts=${System.currentTimeMillis()}\n"
    def tryCreate(): Boolean =
      try {
        Files.write(lp, body.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def contention(detail: String): Nothing = throw new IllegalStateException(
      s"$what at $dir is being written by another process ($detail); " +
        s"the $what is single-writer — serialize writers, or if the holder " +
        s"crashed wait out the ${staleMs / 1000}s staleness window (or delete " +
        s"$lp after verifying the holder is gone)")
    if (tryCreate()) return token
    val age: Option[Long] =
      try Some(System.currentTimeMillis() - Files.getLastModifiedTime(lp).toMillis)
      catch { case _: java.nio.file.NoSuchFileException => None }
    age match {
      case None => // holder released between our create and stat — one retry
        if (tryCreate()) token else contention("WRITER_LEASE contended")
      case Some(a) if a > staleMs =>
        // crash-orphaned: stale takeover. CLAIM the stale file with an
        // ATOMIC move (exactly one of N concurrent takers wins — a plain
        // delete-then-create would let a slow taker delete the winner's
        // FRESH lease and run concurrently with it); losing either the
        // move or the re-create reads as ordinary contention.
        // Sweep claim files orphaned by takers that crashed between
        // their move and delete (nothing else ever removes them).
        try {
          val fs = Paths.get(dir).toFile.listFiles()
          if (fs != null) fs.filter(f => f.getName.startsWith("WRITER_LEASE.stale.") &&
            System.currentTimeMillis() - f.lastModified > staleMs)
            .foreach(f => Files.deleteIfExists(f.toPath))
        } catch { case _: java.io.IOException => () }
        val claimed = Paths.get(dir, s"WRITER_LEASE.stale.$token")
        val won =
          try { Files.move(lp, claimed,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: java.io.IOException => false }
        if (won) {
          try Files.deleteIfExists(claimed) catch { case _: java.io.IOException => () }
          if (tryCreate()) token
          else contention("WRITER_LEASE stale-takeover lost to another writer")
        } else if (tryCreate()) token // claimant released very fast
        else contention("WRITER_LEASE stale-takeover lost to another writer")
      case Some(a) =>
        contention(s"WRITER_LEASE held, ${a / 1000}s old")
    }
  }

  /** Heartbeat daemon: mtime refresh every staleMs/4 while the returned
    * flag stays true. Token-checked — after a pathological full-JVM pause
    * long enough to BE taken over, the thread refuses to adopt a
    * successor's lease. Stop via `flag.set(false)` in the caller's
    * finally. */
  def startHeartbeat(dir: String, token: String, staleMs: Long,
      threadName: String): java.util.concurrent.atomic.AtomicBoolean = {
    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val period = math.max(1000L, staleMs / 4)
    val t = new Thread(new Runnable {
      override def run(): Unit = {
        var interrupted = false
        while (running.get() && !interrupted) {
          try {
            if (Files.readString(leasePath(dir)).contains(s"token=$token"))
              Files.setLastModifiedTime(leasePath(dir),
                java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          } catch { case _: java.io.IOException => () }
          try Thread.sleep(period)
          catch { case _: InterruptedException => interrupted = true }
        }
      }
    }, threadName)
    t.setDaemon(true)
    t.start()
    running
  }

  /** Commit-point fence: true iff the lease still carries OUR token. */
  def held(dir: String, token: String): Boolean =
    try Files.readString(leasePath(dir)).contains(s"token=$token")
    catch { case _: java.io.IOException => false }

  /** Delete the lease only if it still carries OUR token — after a stale
    * takeover the successor's lease must survive the predecessor's
    * release. */
  def release(dir: String, token: String): Unit =
    try {
      if (Files.readString(leasePath(dir)).contains(s"token=$token"))
        Files.deleteIfExists(leasePath(dir))
    } catch { case _: java.io.IOException => () }

  /** Acquire + heartbeat around `body`, releasing in finally. The body
    * receives the token for commit-point fencing via [[held]]. */
  def withLease[A](dir: String, staleMs: Long, what: String,
      threadName: String)(body: String => A): A = {
    val token = acquire(dir, staleMs, what)
    val heartbeat = startHeartbeat(dir, token, staleMs, threadName)
    try body(token)
    finally {
      heartbeat.set(false)
      release(dir, token)
    }
  }
}
