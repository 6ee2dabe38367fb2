package graft.chain

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem resolution for every lake/freeze file operation.
  *
  * The lake's 100 TB story depends on living on an object store or HDFS
  * (Lake scaladoc: "one recursive listing RPC on an object store"), so
  * the file layer must speak the `FileSystem` API — `java.nio` walks
  * only a local disk. Every path is resolved against the ACTIVE Spark
  * session's `hadoopConfiguration`, the same configuration Spark's own
  * readers/writers use, so `s3a://`, `hdfs://`, custom schemes and
  * plain local paths all behave identically between the data plane
  * (spark.read/write) and this control plane (listing, skip-existing,
  * promotion renames, compaction swaps).
  *
  * Rename semantics, stated honestly (the crash-safety contracts in
  * Freeze/LakeCompact reason from these):
  *  - HDFS / local: `rename` is atomic; readers see old-name XOR new.
  *  - S3A and most object stores: rename = server-side COPY + DELETE.
  *    Single-FILE promotion stays safe for lake readers because the
  *    destination appears atomically (one object PUT) and the source
  *    lives in a `._tmp`/staging directory that `Lake.listChunks`
  *    skips — a crash between copy and delete leaves only an invisible
  *    leftover. What is NOT guaranteed without HDFS is atomic
  *    REPLACEMENT of an existing destination: overwrite promotions
  *    delete-then-rename, leaving a small no-file window (documented at
  *    the call sites; PLANS.md carries the full swap-site audit).
  */
object LakeFs {

  /** the active session's Hadoop configuration, falling back to a bare
    * `Configuration` (core-default/core-site) for driver-side tooling
    * that runs before any session exists */
  def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: String): FileSystem = fs(new HPath(path))

  /** local paths unwrap to the RAW local filesystem: the default
    * `LocalFileSystem` is checksummed and writes a hidden `.f.crc`
    * sibling next to every create — reports, sidecars and lake files
    * would grow shadow files the `java.nio` layer never produced (and
    * report listings/readers would trip on the binary .crc). Remote
    * schemes pass through untouched. */
  def fs(path: HPath): FileSystem = path.getFileSystem(conf) match {
    case c: org.apache.hadoop.fs.LocalFileSystem => c.getRawFileSystem
    case other => other
  }

  /** render a Hadoop path for storage in ChunkFile/report strings:
    * local-FS paths stay bare (`/lake/x.parquet`, byte-compatible with
    * every existing consumer and the DuckDB oracle), any other scheme
    * keeps its full URI (`s3a://bucket/lake/x.parquet`) */
  def display(p: HPath): String = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
    else p.toString
  }

  def exists(path: String): Boolean = fs(path).exists(new HPath(path))

  /** loud like the java.nio createDirectories it replaced: a false
    * return (path exists as a FILE, FS refusal) must fail here with an
    * attributable message, not later inside an unrelated write task */
  def mkdirs(path: String): Unit = {
    val f = fs(path)
    val p = new HPath(path)
    // the fallback probe (runs only when mkdirs returns false, e.g. a
    // concurrent creator won the race) must not itself throw
    // FileNotFoundException — a transient FS refusal would then surface
    // an unrelated stack instead of this attributable message
    def isDir =
      try f.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    require(f.mkdirs(p) || isDir,
      s"mkdirs $path failed (exists as a file, or filesystem refused)")
  }

  /** delete one file (no-op when absent) */
  def deleteFile(path: String): Unit =
    fs(path).delete(new HPath(path), false)

  def deleteTree(path: String): Unit =
    fs(path).delete(new HPath(path), true)

  /** single-file promotion: rename `src` over `target`, replacing any
    * existing file, with the strongest replace semantics each FS class
    * offers:
    *  - LOCAL: `java.nio` ATOMIC_MOVE + REPLACE_EXISTING — a genuine
    *    POSIX atomic replace. (Hadoop's FileContext is NOT a substitute
    *    here: neither RawLocalFs nor ChecksumFs overrides
    *    `renameInternal(src, dst, overwrite)`, so Rename.OVERWRITE
    *    falls back to AbstractFileSystem's delete-then-rename.)
    *  - HDFS: FileContext Rename.OVERWRITE — DFS implements the
    *    overwrite rename natively and atomically server-side.
    *  - everything else (object stores, custom schemes with no
    *    AbstractFileSystem binding): SINGLE-OBJECT PUT REPLACE — the
    *    staged bytes stream into `create(target, overwrite = true)`,
    *    then the staged file is deleted. On an object store that is
    *    one PUT: the old object stays visible until the new one
    *    commits, so a polling reader NEVER sees the path missing
    *    (r9's delete+rename fallback had exactly that window). A
    *    crash mid-copy leaves the old object live and the staged file
    *    inside the `._tmp` dir listings already skip. The cost is one
    *    extra byte copy, paid only on the explicit-overwrite path.
    *    (Caveat, stated not papered: a custom Hadoop FS whose create
    *    is NOT atomic-on-close — a raw local FS exposed under a
    *    foreign scheme — turns the no-file window into a
    *    content-in-flux window. Every real store connector commits
    *    the object on close; GraftStoreFs models that in the spec.) */
  def promote(src: HPath, target: HPath): Unit = {
    val f = fs(target)
    if (!f.exists(target)) {
      require(f.rename(src, target), s"rename $src -> $target failed")
      return
    }
    val uri = f.makeQualified(target).toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.makeQualified(src).toUri.getPath),
        java.nio.file.Paths.get(uri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      return
    }
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
      fc.rename(f.makeQualified(src), f.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        val in = f.open(src)
        // a create failure (permissions, transient store error) must not
        // leak the already-opened source handle
        val out =
          try f.create(target, true)
          catch {
            case e: Throwable =>
              try in.close() catch { case _: Throwable => () }
              throw e
          }
        try {
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
          // close IS the commit on PUT-on-close connectors — reached
          // only when every staged byte copied
          out.close()
        } catch {
          case e: Throwable =>
            // a failed copy must NOT commit: closing here would publish
            // the partial bytes as the new object (worse than the old
            // no-file window). Abort when the stream supports it
            // (s3a-style multipart cancel), otherwise drop the handle
            // unclosed — the old object stays live either way.
            try out.abort() catch { case _: Throwable => () }
            throw e
        } finally {
          try in.close() catch { case _: Throwable => () }
        }
        f.delete(src, false)
    }
  }

  /** strict rename: fails loudly if the FS refuses (missing parent,
    * existing destination, cross-FS move). Atomic for single files on
    * every FS that matters and for DIRECTORIES on HDFS/local; object
    * stores rename directories as per-object copy+delete, which
    * protocols that swap directory trees (IndexCompact) exclude by
    * contract — see the PLANS.md swap-site audit. */
  def rename(src: String, dst: String): Unit = {
    val f = fs(src)
    require(f.rename(new HPath(src), new HPath(dst)),
      s"rename $src -> $dst failed")
  }

  def readString(path: String): String = {
    val in = fs(path).open(new HPath(path))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** whole-file create that FAILS if the path already exists
    * (Hadoop `create(overwrite = false)` →
    * FileAlreadyExistsException). This is the mutual-exclusion
    * primitive behind publish leases (IndexCompact): HDFS implements
    * it atomically server-side; local/store connectors check-then-act,
    * so callers that need one-winner semantics under simultaneous
    * acquisition must pair this with a read-back verify of their own
    * unique content (see IndexCompact.acquirePublishLease). */
  def createExclusive(path: String, content: String): Unit = {
    val out = fs(path).create(new HPath(path), false)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** whole-file write via create(overwrite=true) — single-object PUT on
    * stores, so readers never see a partial report/sidecar */
  def writeString(path: String, content: String): Unit = {
    val out = fs(path).create(new HPath(path), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** whole-file write published ATOMICALLY for files that are rewritten
    * in place and read concurrently (e.g. the index schema sidecar):
    * stage the bytes under a `._tmp` sibling, then promote() — readers
    * see the previous or the new content, never the truncated
    * in-flux state writeString's create(overwrite) exposes. Atomic on
    * file: (nio replace), HDFS (FileContext OVERWRITE) and PUT-on-close
    * stores; the residual flux window of a custom FS whose create is
    * not atomic-on-close is the promote() caveat, unchanged. */
  def writeStringAtomic(path: String, content: String): Unit = {
    // fixed sibling name: a crash-leftover stage is overwritten by the
    // next write (self-healing); concurrent writers of one path are out
    // of contract at every call site (single compactor per artifact)
    val tmp = s"$path._tmp"
    writeString(tmp, content)
    promote(new HPath(tmp), new HPath(path))
  }

}
