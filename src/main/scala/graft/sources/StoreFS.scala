package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** FILESYSTEM ABSTRACTION for the manifest store's metadata and
  * sidecar IO — the 100× deployment enabler: every read/write the
  * store protocol does (manifests, VERSION pointer, commit log,
  * deletion-vector and update-key sidecars, refs, checkpoint, token)
  * routes through `org.apache.hadoop.fs.FileSystem`, so the same
  * verbs run against HDFS/S3A by giving the table directory a scheme
  * (`hdfs://…/table`). Local paths (no scheme) resolve to the RAW
  * local filesystem — no `.crc` checksum twins (invisible orphan
  * state to vacuum's referenced-set sweep), byte-identical behavior
  * to the previous java.io implementation.
  *
  * Two primitives keep SCHEME-AWARE dispatch, because their atomicity
  * source differs by store:
  *
  *   - [[createExclusive]] (the cross-process commit token): local
  *     uses NIO `Files.createFile` (atomic open-exclusive at the OS);
  *     remote uses `FileSystem.create(path, overwrite=false)`, which
  *     HDFS makes atomic at the NameNode. An object store without
  *     conditional put cannot provide mutual exclusion this way — the
  *     Delta/S3 caveat — and that contract is now ENFORCED: the first
  *     token acquisition per filesystem probes exclusive-create and
  *     REFUSES to commit (loudly, naming the lock-service remedy)
  *     on a filesystem that lets a second create win
  *     ([[verifyConditionalCreate]], ObjectStoreContractSpec).
  *   - [[atomicMove]] (pointer/cache/checkpoint flips): local uses
  *     NIO ATOMIC_MOVE; remote uses `rename`, atomic on HDFS.
  *
  * Everything else (streams, listing, exists, delete, length, seek)
  * is the plain FileSystem API on both.
  */
private[sources] object StoreFS {
  private def conf(): Configuration = {
    val c = new Configuration()
    // raw local FS (no .crc twins; append supported), cache disabled
    // so a checksummed LocalFileSystem instance cached by Spark under
    // the `file` scheme can never shadow this choice
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.setBoolean("fs.file.impl.disable.cache", true)
    // deployment/test hook: `-Dgraft.hadoop.fs.xyz.impl=...` injects
    // extra FileSystem bindings (e.g. a custom object-store client)
    // without touching core-site.xml
    sys.props.foreach { case (k, v) =>
      if (k.startsWith("graft.hadoop.")) c.set(k.stripPrefix("graft.hadoop."), v)
    }
    c
  }

  // scheme-present ⇒ Hadoop FS path (Path.toString normalizes
  // `file:///x` to `file:/x`, so a bare "://" test misses it)
  private def isLocal(dir: String): Boolean =
    !dir.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:/.*")

  def fs(dir: String): FileSystem = new Path(dir).getFileSystem(conf())

  def path(dir: String, name: String): Path = new Path(dir, name)

  def exists(dir: String, name: String): Boolean =
    if (isLocal(dir)) new java.io.File(dir, name).exists()
    else fs(dir).exists(path(dir, name))

  def delete(dir: String, name: String): Boolean =
    if (isLocal(dir)) new java.io.File(dir, name).delete()
    else fs(dir).delete(path(dir, name), false)

  def mkdirs(dir: String): Unit =
    if (isLocal(dir)) { new java.io.File(dir).mkdirs(); () }
    else { fs(dir).mkdirs(new Path(dir)); () }

  def length(dir: String, name: String): Long =
    if (isLocal(dir)) new java.io.File(dir, name).length()
    else fs(dir).getFileStatus(path(dir, name)).getLen

  def listNames(dir: String): Seq[String] =
    if (isLocal(dir))
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .map(_.getName).toSeq
    else {
      val p = new Path(dir)
      val f = fs(dir)
      if (!f.exists(p)) Nil
      else f.listStatus(p).map(_.getPath.getName).toSeq
    }

  /** Read a whole (metadata-class) file as UTF-8 lines. */
  def readLines(dir: String, name: String): Seq[String] =
    readLinesAt(path(dir, name).toString, dir)

  /** [[readLines]] for an absolute or dir-relative path string (the
    * sidecar paths shipped into task closures).
    */
  def readLinesAt(p: String, hint: String = ""): Seq[String] = {
    val base = if (hint.nonEmpty) hint else p
    if (isLocal(base)) {
      val src = scala.io.Source.fromFile(p)
      try src.getLines().toList finally src.close()
    } else {
      val in = fs(base).open(new Path(p))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
  }

  /** Write a small metadata file (manifest, sidecar, ref) in full. */
  def writeString(dir: String, name: String, content: String): Unit =
    if (isLocal(dir)) {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try w.print(content) finally w.close()
    } else {
      val out = fs(dir).create(path(dir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

  /** Append one record to a log file (the commit log). UTF-8 on both
    * branches — FileWriter would use the platform default charset,
    * which the UTF-8 readers (readLines/readRange/lastLine) would then
    * mis-decode on a non-UTF-8-default JVM.
    */
  def appendString(dir: String, name: String, content: String): Unit =
    if (isLocal(dir)) {
      val w = new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(new java.io.File(dir, name), true),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.write(content) finally w.close()
    } else {
      val f = fs(dir)
      val p = path(dir, name)
      val out = if (f.exists(p)) f.append(p) else f.create(p, false)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

  /** Atomic pointer flip: write-then-move so a concurrent reader can
    * never observe a torn file. The remote branch leans on `rename`
    * being ATOMIC (HDFS guarantees it at the NameNode); object stores
    * whose rename is client-side copy+delete (S3-class) cannot host
    * the pointer flip — [[verifyAtomicRename]] refuses them loudly
    * instead of letting a reader observe a torn/absent pointer.
    */
  def atomicMove(dir: String, from: String, to: String): Unit =
    if (isLocal(dir)) {
      java.nio.file.Files.move(
        new java.io.File(dir, from).toPath,
        new java.io.File(dir, to).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else {
      verifyAtomicRename(dir)
      val f = fs(dir)
      val dst = path(dir, to)
      if (f.exists(dst)) f.delete(dst, false)
      require(f.rename(path(dir, from), dst), s"rename $from -> $to failed")
    }

  /** Atomic open-exclusive of the commit token; false ONLY when the
    * token already exists (contention). Any other IOException
    * (permissions, connectivity) is rethrown — mapping it to false
    * would make the caller's token spin-wait retry forever against a
    * failure that no amount of waiting clears, with no stale-steal
    * escape (a never-created token has lastModified 0, below the
    * steal guard's lm > 0 gate).
    */
  def createExclusive(dir: String, name: String): Boolean =
    if (isLocal(dir)) {
      try {
        java.nio.file.Files.createFile(new java.io.File(dir, name).toPath)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      verifyConditionalCreate(dir)
      try { fs(dir).create(path(dir, name), false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException
          if String.valueOf(e.getMessage).toLowerCase.contains("already exists") => false
      }
    }

  private val casVerified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.URI]()
  private val renameVerified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.URI]()

  /** Schemes whose stock Hadoop clients are KNOWN to lack one or both
    * of the store protocol's two atomicity primitives: S3-class
    * clients rename by copy+delete (never atomic) and classically
    * implement exclusive create as HEAD-then-PUT (a race no behavioral
    * probe can observe from one process). Deployments that front these
    * with a consistency layer opt in per capability:
    * `-Dgraft.store.assumeConditionalCreate=s3a` /
    * `-Dgraft.store.assumeAtomicRename=s3a` (comma lists).
    */
  private val KnownNonAtomicSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "swift", "wasb")

  private def schemeTrusted(f: FileSystem, prop: String): Boolean = {
    val scheme = Option(f.getUri.getScheme).getOrElse("")
    sys.props.get(prop).exists(_.split(',').map(_.trim).contains(scheme))
  }

  private def refuseKnownNonAtomic(f: FileSystem, prop: String,
      capability: String): Unit = {
    val scheme = Option(f.getUri.getScheme).getOrElse("")
    if (KnownNonAtomicSchemes(scheme) && !schemeTrusted(f, prop))
      throw new IllegalStateException(
        s"filesystem scheme '$scheme' (${f.getUri}) is known to lack " +
          s"$capability — refusing to commit. Front the store with a " +
          "consistency/lock service, then opt in explicitly with " +
          s"-D$prop=$scheme.")
  }

  /** ENFORCED OBJECT-STORE CONTRACT (best-effort): the commit token's
    * mutual exclusion rests entirely on `create(path, overwrite=false)`
    * being ATOMIC and REJECTING an existing file (HDFS does at the
    * NameNode; S3 without conditional PUT silently overwrites — the
    * documented Delta/S3 caveat). A store on such a filesystem would
    * hand two writers the same token and corrupt the log. Two gates:
    * (1) KNOWN non-atomic schemes are refused outright absent the
    * explicit `-Dgraft.store.assumeConditionalCreate=<scheme>` opt-in —
    * necessary because a client doing non-atomic HEAD-then-PUT PASSES
    * the behavioral probe single-process yet still races two writers;
    * (2) the first token acquisition per filesystem PROBES: create a
    * marker, then attempt a second exclusive create of the same marker
    * — if the second one succeeds (overwrite-silently semantics), the
    * store REFUSES to commit, loudly naming the remedy (an external
    * lock service). The probe therefore catches overwrite-silently
    * stores ONLY; the scheme gate covers the check-then-write class.
    * One-time, two metadata ops, cached per FS URI.
    */
  private def verifyConditionalCreate(dir: String): Unit = {
    val f = fs(dir)
    if (casVerified.contains(f.getUri)) return
    refuseKnownNonAtomic(f, "graft.store.assumeConditionalCreate",
      "atomic exclusive create (conditional PUT)")
    mkdirs(dir)
    val probe = path(dir, s".cas-probe-${java.util.UUID.randomUUID()}")
    try {
      f.create(probe, false).close()
      val second =
        try { f.create(probe, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (second) throw new IllegalStateException(
        s"filesystem ${f.getUri} does not enforce exclusive create " +
          "(no conditional PUT): the commit token cannot provide mutual " +
          "exclusion here — refusing to commit. Use a store on HDFS-class " +
          "storage, or front commits with an external lock service.")
      casVerified.add(f.getUri): Unit
    } finally { try f.delete(probe, false) catch { case _: Throwable => () } }
  }

  /** RENAME half of the contract: pointer flips assume `rename` is
    * ATOMIC (HDFS guarantees it at the NameNode; S3-class clients
    * implement it as copy+delete). Unlike the create half there is NO
    * behavioral probe that can tell the two apart from one process — a
    * POSIX atomic-replace and an S3 unconditional-copy produce
    * identical observable results — and Hadoop publishes no
    * atomic-rename path capability, so this gate is DECLARATIVE:
    * known copy-rename schemes are refused outright absent the
    * explicit `-Dgraft.store.assumeAtomicRename=<scheme>` opt-in (for
    * deployments fronting the store with a consistency layer). Cached
    * per FS URI like the create probe.
    */
  private def verifyAtomicRename(dir: String): Unit = {
    val f = fs(dir)
    if (renameVerified.contains(f.getUri)) return
    refuseKnownNonAtomic(f, "graft.store.assumeAtomicRename",
      "atomic rename (its rename is client-side copy+delete, so the " +
        "VERSION pointer flip could tear under a concurrent reader)")
    renameVerified.add(f.getUri): Unit
  }

  def lastModified(dir: String, name: String): Long =
    if (isLocal(dir)) new java.io.File(dir, name).lastModified()
    else {
      val f = fs(dir)
      val p = path(dir, name)
      if (f.exists(p)) f.getFileStatus(p).getModificationTime else 0L
    }

  /** Last nonempty line of a file in O(line) IO: growing backwards
    * chunk reads from the tail (one seek per doubling, never a full
    * scan) — the commit log's monotone-clamp read on a million-commit
    * table.
    */
  def lastLine(dir: String, name: String): Option[String] = {
    if (!exists(dir, name)) return None
    val len = length(dir, name)
    if (len == 0) return None
    var chunk = 4096L
    while (true) {
      val from = math.max(0L, len - chunk)
      val s = new String(readRange(dir, name, from), "UTF-8")
      val trimmed = s.reverse.dropWhile(c => c == '\n' || c == '\r').reverse
      val i = trimmed.lastIndexOf('\n')
      if (i >= 0) return Some(trimmed.substring(i + 1).trim).filter(_.nonEmpty)
      if (from == 0L) return Some(trimmed.trim).filter(_.nonEmpty)
      chunk *= 4
    }
    None // unreachable
  }

  /** Read `[from, length)` of a file as UTF-8 (the txn-cache tail
    * scan and the backwards last-line seek).
    */
  def readRange(dir: String, name: String, from: Long): Array[Byte] =
    if (isLocal(dir)) {
      val raf = new java.io.RandomAccessFile(new java.io.File(dir, name), "r")
      try {
        raf.seek(from)
        val buf = new Array[Byte]((raf.length() - from).toInt)
        raf.readFully(buf)
        buf
      } finally raf.close()
    } else {
      val f = fs(dir)
      val p = path(dir, name)
      val len = f.getFileStatus(p).getLen
      val in = f.open(p)
      try {
        in.seek(from)
        val buf = new Array[Byte]((len - from).toInt)
        in.readFully(buf)
        buf
      } finally in.close()
    }
}
