package graft.operators

import graft.chain.LakeFs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Maintenance for persisted index artifacts (IVF-PQ vector index,
  * text dedup index). The streaming ingest twins (encodeStream,
  * indexDedupStream) append one small parquet file per micro-batch
  * forever — correct, but after days of ingest a search pays thousands
  * of file opens and the probe join loses its pruning leverage.
  * `compact` rewrites the accumulating artifact into key-partitioned
  * files — `codes` by `centroid_id` (the probe join then prunes whole
  * directories of unprobed cells at PLANNING time), `bands` by
  * `band_idx` — and coalesces the small flat artifacts (fps, sigs)
  * into shuffle-partition-count files. Search results are
  * hash-identical before/after (spec-pinned): compaction moves bytes,
  * never rows.
  *
  * ## Pointer-manifest layout (r10)
  *
  * An artifact's live tree is named by a POINTER, never moved into
  * place: data lives under versioned dirs `<artifact>.v<N>-<uid>`
  * (uid = the publish cycle's identity token; pre-r12 trees are the
  * bare `<artifact>.v<N>`) and the current version is the highest
  * `<artifact>.ptr.v<N>` marker file. Publishing a rewrite = writing
  * the new tree under the next version dir, then CREATING one pointer
  * marker — a single-object PUT, atomic on every filesystem class
  * including object stores. The marker's version rides in its NAME,
  * so a reader can never observe a half-written version number; its
  * CONTENT carries the publish uid that names the tree (a reader that
  * catches the content mid-flight on a non-atomic FS simply resolves
  * the PREVIOUS version, which the grace window keeps alive). This
  * replaces the r9 directory-rename swap, whose atomic-dir-rename
  * requirement put object-store index dirs out of contract (PLANS.md
  * swap-site audit — now closed).
  *
  * Readers resolve the pointer per read (`resolvePath`). The PREVIOUS
  * version tree is retained as a grace window for readers that
  * resolved it just before a flip; anything older is garbage-collected
  * by the next compact/build. A reader slower than one full
  * compaction cycle is out of contract (the standard manifest-system
  * grace rule). Pre-pointer artifacts — a bare `<dir>/<artifact>`
  * written by r9 code — keep working: no pointer marker means the
  * legacy path IS the artifact; the first publish migrates it into
  * the versioned layout and the legacy tree then gets the SAME
  * one-cycle grace as a previous version dir (retired by the next
  * publish/compact), so a reader mid-scan over it survives the
  * migration flip. Because fresh builds also publish through
  * `writeFresh` (version + flip), the pointer, when present, is
  * ALWAYS newest — a graced or crash-stale legacy tree can never
  * shadow it.
  *
  * Directory-partitioned parquet re-infers partition-column types on
  * read (a 0-15 long key comes back int) and appends partition columns
  * last, so each compaction writes a schema sidecar
  * (`<artifact>_schema.json`) and `read` restores the recorded column
  * order and types — loaders see ONE schema whether the artifact is
  * flat (fresh build), fragmented (post-ingest) or compacted. Repeated
  * compaction is idempotent for the same reason: the rewrite reads
  * through the same pinned schema. The sidecar is layout-independent
  * (same columns every version), so it lives beside the pointer, not
  * inside the version dirs.
  *
  * Compact-during-ongoing-ingest: a directory-partitioned artifact
  * must never receive flat per-micro-batch appends at its root —
  * Spark's partition discovery rejects the mixed layout ("Conflicting
  * directory structures"). Streaming sinks therefore target the FLAT
  * side-artifact `streamArtifact(artifact)` (e.g.
  * `codes_stream.parquet`), which `read` unions with the main layout
  * through the pinned schema. `compact` rewrites only the main
  * artifact, so an active ingest stream is never disturbed; once the
  * stream is STOPPED, `compact(foldStream = true)` folds the side
  * rows into the partitioned layout and removes the side-artifact
  * (folding under an active writer would strand the sink's
  * `_spark_metadata` log, so the fold path requires ingest stopped —
  * enforced as a documented contract, spec-pinned for the stopped
  * case).
  *
  * Crash matrix (every point leaves a readable, not-double-counted
  * artifact — see `recover`):
  *  - after the new tree, before the flip: the pointer still names the
  *    old version; the new tree is an orphan the next compact GCs.
  *  - after the flip: the new tree is live; stale legacy/old versions
  *    are garbage the next compact GCs.
  *  - fold: the `fold_pending` marker (content = the version the fold
  *    targets) is written BEFORE the flip. Marker naming the CURRENT
  *    version means the flip happened and the side rows are already in
  *    the main artifact → finish the crash-interrupted side delete (or
  *    read() would union them twice). Marker naming a NON-current
  *    version means the flip never happened — the side rows live only
  *    in the side-artifact, keep it; the marker is a pre-flip leftover
  *    only the compact path may drop.
  *
  * Filesystem contract: all file operations go through the Hadoop
  * FileSystem of the index dir (LakeFs) and the publish step is a
  * single-object create — local disk, HDFS and strongly-consistent
  * object stores are all in contract.
  *
  * Concurrency contract (r11): every PUBLISH cycle — a compact rewrite
  * or a fresh build — runs under two publisher locks: an in-process
  * per-artifact lock (same-JVM publishers queue) and a cross-process
  * PUBLISH LEASE (`<artifact>.publish_lock`, create-exclusive with
  * read-back verify; see the lease section). Two compactors in
  * different processes therefore get ONE winner; the loser fails
  * loudly with the holder's identity instead of double-allocating a
  * version or GC-ing the winner's in-flight tree. Crashed holders are
  * detected (same host: pid liveness; remote: TTL age-out) and their
  * leases broken. Readers never take the lease — read-during-publish,
  * in or across processes, stays safe by the pointer grace window.
  * The lease RENEWS after each long tree write (age tracks progress,
  * not start) and the pointer flip is GATED on a still-owner re-check
  * — a publisher whose lease was stolen (TTL expiry on a remote host,
  * pid reuse, out-of-contract deletion) aborts LOUDLY without
  * flipping instead of silently double-publishing.
  *
  * Fencing (r12): the residual double-claim classes — the stale-break
  * re-read→delete TOCTOU (now conditional, breakStaleLease), a
  * remote-TTL steal landing between the still-owner check and the
  * create — are fenced by IDENTITY, not timing. Every publish cycle
  * carries a uid token (PublishLease.uid8); its version TREE is
  * uid-suffixed, so two publishers racing one version number write
  * DISJOINT directories (a torn tree behind a live pointer is
  * structurally impossible), and the pointer flip is an EXCLUSIVE
  * create carrying the uid plus a read-back verify (flipPointer), so
  * exactly one of them publishes and the other aborts loudly with its
  * tree left as GC-able garbage. Steal-under-TTL is spec-pinned: a
  * simulated remote holder whose lease ages out mid-cycle aborts at
  * the flip gate while the thief's publish stands, single-counted.
  * Remaining residual, stated not papered: a holder that loses its
  * lease but whose flip wins the race publishes a CORRECT tree the
  * thief then supersedes — last-writer-wins on whole versions, never
  * torn bytes. */
object IndexCompact {

  private def sidecarPath(dir: String, artifact: String) =
    s"$dir/${artifact.stripSuffix(".parquet")}_schema.json"

  /** flat side-artifact streaming sinks append to (never the main
    * artifact root, which may be directory-partitioned post-compact) */
  def streamArtifact(artifact: String): String =
    s"${artifact.stripSuffix(".parquet")}_stream.parquet"

  /** absolute sink path for a streaming ingest targeting `artifact` */
  def streamPath(dir: String, artifact: String): String =
    s"$dir/${streamArtifact(artifact)}"

  /** fold-in-progress marker: present iff a foldStream rewrite has
    * written the folded tree; its CONTENT names the version the fold
    * targets (see the crash matrix in the class doc) */
  private def foldMarkerPath(dir: String, artifact: String) =
    s"$dir/$artifact.fold_pending"

  /** publisher-unique version tree (r12): the publish uid rides in the
    * tree NAME, so two publishers that both believe they own version N
    * (the residual double-claim classes: stale-break TOCTOU, remote-TTL
    * steal mid-cycle) write DISJOINT directories — a torn tree behind a
    * live pointer is structurally impossible; the loser's tree is an
    * orphan the next publish GCs. Pre-r12 trees are the bare
    * `<artifact>.v<N>` (uid = "") and keep resolving. */
  private[graft] def versionDir(dir: String, artifact: String, v: Int,
      uid: String): String =
    if (uid.isEmpty) s"$dir/$artifact.v$v" else s"$dir/$artifact.v$v-$uid"
  private def ptrPath(dir: String, artifact: String, v: Int) =
    s"$dir/$artifact.ptr.v$v"

  /** test seam for the cross-process specs: a non-empty tag makes this
    * thread behave like a SEPARATE process — it keys its own in-process
    * lock instances (two tags never share a JVM lock, exactly like two
    * JVMs) and suffixes its publish-lease identity so the lease
    * protocol, not shared memory, is what serializes them. Production
    * code never sets it. */
  private[graft] val processTag: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "")

  /** per-(dir, artifact) in-process lock: read()'s recovery and
    * rewrite()'s publish flip are mutually exclusive, so a concurrent
    * search can never mistake an IN-FLIGHT compact's fold marker or
    * orphan tree for crash leftovers and destroy them. Cross-process
    * publishers are serialized by the publish LEASE below, not by
    * this. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def lockFor(dir: String, artifact: String): Object =
    locks.computeIfAbsent(s"${processTag.get}|$dir/$artifact", _ => new Object)

  /** per-(dir, artifact) in-process PUBLISH lock, held across a whole
    * publish cycle (version allocation + tree write + flip + GC) by
    * writeFresh and rewrite. Same-JVM publishers therefore QUEUE
    * instead of burning lease-acquisition failures — this closes the
    * in-process builder-vs-compact window where both could allocate
    * one version and compact's GC could reap the builder's in-flight
    * tree (ADVICE r10). Distinct from `locks`: readers never take
    * this, so a publish holding it for a long parquet write does not
    * stall read(). */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def publishLockFor(dir: String, artifact: String): Object =
    publishLocks.computeIfAbsent(
      s"${processTag.get}|$dir/$artifact", _ => new Object)

  // ---- cross-process publish lease (r11) ----------------------------
  //
  // One publisher per artifact ACROSS processes: every publish cycle
  // (compact rewrite or fresh build) first claims
  // `<artifact>.publish_lock` via create-exclusive, holds it for the
  // whole allocate+write+flip+GC cycle, and deletes it on the way out.
  // The loser of a claim fails LOUDLY with the holder's identity — it
  // never silently double-allocates a version or GCs the winner's
  // in-flight tree. Readers never touch the lease (read-during-publish
  // stays lock-free via the grace window).
  //
  // Staleness (a holder that crashed without releasing): the lease
  // records `pid@host ts uid`. A same-host lease is stale when its pid
  // is no longer alive (pid liveness beats any timeout — a 3-hour
  // compaction never gets stolen on its own host; pid-reuse is the
  // documented residual). A remote-host lease can only age out: stale
  // after GRAFT_PUBLISH_LEASE_TTL_MS (default 2 h) — a REMOTE publisher
  // legitimately running longer than the TTL is out of contract, the
  // standard lease caveat. Stale leases are broken (logged) and
  // re-claimed.
  //
  // Atomicity grade, stated honestly: HDFS create-exclusive is atomic
  // server-side; local and PUT-on-close store connectors check-then-
  // act, so the claim pairs the create with a READ-BACK VERIFY of the
  // claimant's unique content — near-simultaneous claimants on such an
  // FS both "create", but the survivor content picks exactly one
  // winner on replace-on-close semantics (GraftStoreFs models this).

  private def leasePath(dir: String, artifact: String) =
    s"$dir/$artifact.publish_lock"

  /** test seam: the remote-holder TTL, overridable so the
    * steal-under-TTL spec can age a lease out in milliseconds instead
    * of hours. Production reads the env knob. */
  @volatile private[graft] var ttlOverrideMs: Option[Long] = None

  private def leaseTtlMs: Long =
    ttlOverrideMs.orElse(
      sys.env.get("GRAFT_PUBLISH_LEASE_TTL_MS").flatMap(_.toLongOption))
      .getOrElse(2L * 60 * 60 * 1000)

  private val localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Throwable => "localhost" }

  /** test seam: the host name this thread's lease claims record — a
    * non-empty tag makes this thread's leases look REMOTE to every
    * other claimant (pid liveness can't vouch for a foreign host, so
    * only the TTL can age them out), which is how the steal-under-TTL
    * spec simulates a remote publisher. Production never sets it. */
  private[graft] val hostTag: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "")
  private def claimHost: String = {
    val t = hostTag.get
    if (t.isEmpty) localHost else t
  }

  /** unique per (JVM, simulated process, acquisition) owner record */
  private def leaseContent(): String = {
    val tag = processTag.get
    val uid = java.util.UUID.randomUUID().toString
    s"${ProcessHandle.current().pid()}@$claimHost " +
      s"${System.currentTimeMillis()} $uid${if (tag.isEmpty) "" else s" $tag"}"
  }

  /** a holder is stale when its process is provably gone: same host →
    * pid no longer alive (an unparseable pid counts as gone); remote
    * host → older than the TTL */
  private def leaseStale(content: String): Boolean = {
    val parts = content.trim.split("\\s+")
    val pidHost = parts.headOption.getOrElse("").split("@", 2)
    val ts = parts.lift(1).flatMap(_.toLongOption).getOrElse(0L)
    if (pidHost.lift(1).contains(localHost))
      pidHost.headOption.flatMap(_.toLongOption).forall { p =>
        val h = ProcessHandle.of(p)
        !(h.isPresent && h.get().isAlive)
      }
    else System.currentTimeMillis() - ts > leaseTtlMs
  }

  /** claim the artifact's publish lease or throw with the holder's
    * identity; breaks provably-stale leases (once, loudly) */
  private[graft] def acquirePublishLease(dir: String, artifact: String): String = {
    val path = leasePath(dir, artifact)
    val mine = leaseContent()
    var attempt = 0
    while (attempt < 2) {
      attempt += 1
      val created =
        try { LakeFs.createExclusive(path, mine); true }
        catch { case _: java.io.IOException => false }
      // read-back verify: on a check-then-act FS two near-simultaneous
      // creators can both "succeed" — the surviving content names the
      // one winner
      val survivor =
        try Some(LakeFs.readString(path))
        catch { case _: java.io.IOException => None }
      if (created && survivor.contains(mine)) return mine
      survivor match {
        case Some(held) if leaseStale(held) =>
          System.err.println(s"[index] breaking stale publish lease on " +
            s"$dir/$artifact (holder: ${held.trim})")
          breakStaleLease(path, held)
        case Some(held) =>
          throw new IllegalStateException(
            s"concurrent publish on $dir/$artifact: the publish lease " +
              s"is held by ${held.trim} (this publisher lost the " +
              "claim; retry after the holder finishes)")
        case None => () // holder released between probe and read — retry
      }
    }
    throw new IllegalStateException(
      s"could not claim the publish lease on $dir/$artifact after a " +
        "stale-break retry")
  }

  /** CONDITIONAL stale-break: delete the lease only if an immediate
    * re-read still shows the exact content previously judged stale. An
    * unconditional delete here was a one-winner defeat (ADVICE r11
    * medium): two claimants that both read the same stale lease would
    * each delete+create, and the slower one's blind delete removed the
    * faster winner's FRESH lease — both then held, both allocated one
    * version. With the re-read, the slower claimant sees the winner's
    * fresh content, declines the delete, and its own create fails →
    * it loses loudly on the next loop pass. (The re-read→delete gap is
    * the residual TOCTOU, microseconds against the seconds-scale
    * claim cycle; the publisher-unique version trees + exclusive
    * pointer create below turn even that residue into an abort, never
    * a torn tree.) Returns whether the delete happened. */
  private[graft] def breakStaleLease(path: String, judged: String): Boolean = {
    val now =
      try Some(LakeFs.readString(path))
      catch { case _: java.io.IOException => None }
    if (now.contains(judged)) { LakeFs.deleteFile(path); true }
    else false
  }

  /** release only a lease this publisher owns — never delete a lease
    * that was (out-of-contract) stolen and re-claimed by someone else */
  private[graft] def releasePublishLease(dir: String, artifact: String,
      mine: String): Unit = {
    val path = leasePath(dir, artifact)
    val held = try Some(LakeFs.readString(path))
      catch { case _: java.io.IOException => None }
    if (held.contains(mine)) LakeFs.deleteFile(path)
  }

  /** live handle on a held publish lease. `renew()` refreshes the
    * timestamp (call after the long tree write so a multi-hour
    * publish's lease age tracks its PROGRESS, not its start — the
    * remote-TTL steal window shrinks to one write's duration);
    * `assertStillOwner()` is the FLIP GATE: called immediately before
    * the pointer create, it turns the residual steal classes (TTL
    * expiry on a remote host, pid reuse, out-of-contract deletion)
    * from a silent double-publish into a loud abort — a publisher that
    * lost its lease never flips. */
  private[graft] final class PublishLease(dir: String, artifact: String,
      private var mine: String) {
    /** this publish CYCLE's identity token (first 8 hex of the
      * acquisition uuid) — fixed across renew()s, it names the cycle's
      * version tree and rides in the pointer marker's content, fencing
      * the flip (see flipPointer). */
    val uid8: String =
      mine.trim.split("\\s+").lift(2).map(_.take(8)).getOrElse("anon0000")
    private def held: Option[String] =
      try Some(LakeFs.readString(leasePath(dir, artifact)))
      catch { case _: java.io.IOException => None }
    def assertStillOwner(): Unit = {
      val h = held
      require(h.contains(mine),
        s"publish lease on $dir/$artifact lost mid-cycle (stolen or " +
          s"expired): now ${h.map(_.trim).getOrElse("<absent>")} — " +
          "aborting without flipping")
    }
    def renew(): Unit = {
      assertStillOwner()
      val next = leaseContent()
      // in-place rewrite read concurrently by other claimants' probes →
      // atomic replace, never a truncate window
      LakeFs.writeStringAtomic(leasePath(dir, artifact), next)
      mine = next
    }
    def release(): Unit = releasePublishLease(dir, artifact, mine)
  }

  /** run one whole publish cycle under BOTH publisher locks: same-JVM
    * publishers queue on the in-process lock, cross-process ones are
    * serialized (or failed loudly) by the lease. The body receives the
    * lease handle: renew() after long writes, assertStillOwner() as
    * the flip gate. */
  private def withPublishLease[A](dir: String, artifact: String)(
      body: PublishLease => A): A =
    publishLockFor(dir, artifact).synchronized {
      val lease = new PublishLease(dir, artifact,
        acquirePublishLease(dir, artifact))
      try body(lease)
      finally lease.release()
    }

  /** all published versions of the artifact, descending */
  private def ptrVersions(dir: String, artifact: String): Seq[Int] = {
    val fs = LakeFs.fs(dir)
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) return Seq.empty
    val pre = s"$artifact.ptr.v"
    fs.listStatus(base).iterator.map(_.getPath.getName)
      .filter(_.startsWith(pre))
      .flatMap(n => n.stripPrefix(pre).toIntOption)
      .toSeq.sorted.reverse
  }

  /** current published version: the highest `<artifact>.ptr.v<N>`
    * marker under `dir`, 0 when the artifact has never been published
    * through the pointer layout (legacy flat artifact, or absent) */
  def currentVersion(dir: String, artifact: String): Int =
    ptrVersions(dir, artifact).headOption.getOrElse(0)

  /** the publish uid a version marker carries — Some("") for the
    * r10/r11 zero-byte markers (bare version tree), Some(uid) for r12
    * fenced markers, None for a marker whose content isn't READABLE
    * yet (flip in flight on a non-atomic FS — the caller must defer to
    * the previous version, not guess a tree; r13, ADVICE) */
  private def ptrUid(dir: String, artifact: String, v: Int): Option[String] =
    try Some(LakeFs.readString(ptrPath(dir, artifact, v)).trim)
    catch { case _: java.io.IOException => None }

  /** the tree a version marker names, if it exists. r13 tightening
    * (ADVICE): the bare (uid-less) version dir is accepted ONLY for a
    * CONFIRMED zero-byte marker — the pre-r12 layout, whose publishes
    * wrote empty markers over bare trees. A marker whose content is
    * not yet readable (mid-flight create on a non-atomic FS) resolves
    * to NOTHING, so resolvePath defers to the previous complete
    * version instead of a bare crash-orphan tree that happens to share
    * the version number (publishTree also GCs such orphans pre-write —
    * two independent closures of the same race). */
  private def treeOfPtr(dir: String, artifact: String, v: Int): Option[String] =
    ptrUid(dir, artifact, v) match {
      case None => None // unreadable marker: mid-flight — defer
      case Some(uid) =>
        Some(versionDir(dir, artifact, v, uid)).filter(LakeFs.exists)
    }

  /** the artifact's live data path: the newest version marker whose
    * tree is RESOLVABLE (content visible and directory present — a
    * marker caught mid-flip on a non-atomic FS simply defers to the
    * previous version, which the grace window keeps alive), or the
    * legacy flat path for artifacts never published through the
    * pointer layout. Public — specs and external tools that need the
    * physical tree (file counts, fragment simulation) resolve here
    * instead of assuming `<dir>/<artifact>`. */
  def resolvePath(dir: String, artifact: String): String =
    ptrVersions(dir, artifact).iterator
      .flatMap(v => treeOfPtr(dir, artifact, v))
      .nextOption()
      .getOrElse(s"$dir/$artifact")

  /** present = published through the pointer layout OR a legacy tree */
  private def artifactExists(dir: String, artifact: String): Boolean =
    currentVersion(dir, artifact) > 0 || LakeFs.exists(s"$dir/$artifact")

  /** drop version trees and pointer markers outside the {current,
    * previous} grace window — covers orphan trees ABOVE current (crash
    * between tree write and flip) and ancients below the grace. Only
    * ever called on the compact/build path under the artifact lock. */
  private def gcStale(dir: String, artifact: String, current: Int): Unit = {
    val fs = LakeFs.fs(dir)
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) return
    val keep = Set(current, current - 1)
    val treePre = s"$artifact.v"
    val ptrPre = s"$artifact.ptr.v"
    // tree names are `<artifact>.v<N>` (pre-r12) or `<artifact>.v<N>-<uid>`
    // (publisher-unique, r12). A fence-loser's orphan tree at a KEPT
    // version is retained until its version number leaves the grace
    // window — its publisher's Spark job may still be writing task
    // files, and deleting garbage late costs nothing.
    def treeVersion(rest: String): Option[Int] = {
      val digits = rest.takeWhile(_.isDigit)
      if (digits.isEmpty) None
      else if (rest.length == digits.length || rest.charAt(digits.length) == '-')
        digits.toIntOption
      else None
    }
    fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(ptrPre))
        n.stripPrefix(ptrPre).toIntOption
          .filterNot(keep).foreach(_ => LakeFs.deleteFile(s"$dir/$n"))
      else if (n.startsWith(treePre))
        treeVersion(n.stripPrefix(treePre))
          .filterNot(keep).foreach(_ => LakeFs.deleteTree(s"$dir/$n"))
    }
  }

  /** Drop a pre-r12 crash orphan — a BARE (uid-less) tree at a version
    * number that has NO marker — before this publish reuses that
    * number (r13, ADVICE): without this, a reader catching the new
    * marker's content mid-flight on a non-atomic FS could have
    * resolved the possibly-torn orphan via the old bare-dir fallback.
    * Safe under the lease: `v` has no marker (currentVersion < v), so
    * a bare tree there can only be a crash leftover, never live data.
    * treeOfPtr's zero-byte-only fallback is the read-side closure of
    * the same race; this is the write-side one. */
  private def gcBareOrphan(dir: String, artifact: String, v: Int): Unit = {
    val bare = versionDir(dir, artifact, v, "")
    if (LakeFs.exists(bare)) LakeFs.deleteTree(bare)
  }

  /** THE FLIP, fenced by the publish-cycle uid (r12): one EXCLUSIVE
    * create of the version marker carrying this cycle's uid, then a
    * read-back verify. Two publishers that survived every earlier gate
    * and race the same version number therefore get exactly one
    * pointer: on an atomic-create FS the loser's create throws; on a
    * check-then-act store both "create" but the surviving content
    * names one winner and the loser's verify aborts. Either way the
    * loser aborts LOUDLY and its (publisher-unique) tree is an orphan
    * the next publish GCs — never a flipped pointer over a torn or
    * foreign tree. */
  private[graft] def flipPointer(dir: String, artifact: String, v: Int,
      uid: String): Unit = {
    val path = ptrPath(dir, artifact, v)
    try LakeFs.createExclusive(path, uid)
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"publish fenced on $dir/$artifact: version marker v$v already " +
            "exists — a concurrent publisher won this version; aborting " +
            "(this publisher's tree is an orphan the next publish GCs)", e)
    }
    val survivor =
      try LakeFs.readString(path).trim
      catch { case _: java.io.IOException => "" }
    require(survivor == uid,
      s"publish fenced on $dir/$artifact: version marker v$v carries " +
        s"'$survivor', not this publisher's uid '$uid' — lost the flip " +
        "race, aborting (tree orphaned for GC)")
  }

  /** Publish a FRESH build of an artifact: write the frame under the
    * next version dir, flip the pointer (one atomic create), retire
    * any legacy flat tree, GC beyond the grace window. Builders
    * (saveIvfPqIndex, saveTextIndex) publish through here so the
    * pointer is always the newest truth — a rebuild after a compact
    * bumps the version rather than writing a shadowed legacy tree. */
  def writeFresh(spark: SparkSession, dir: String, artifact: String,
      df: DataFrame): Unit =
    publishTree(spark, dir, artifact)(vdir =>
      df.write.mode("overwrite").parquet(vdir))

  /** Publish an arbitrary TREE as the artifact's next version — the
    * whole-index generalization of writeFresh: `write` receives the
    * version dir and may lay out ANYTHING under it (e.g. a full index
    * triple as subdirectories); the same lease + fenced flip then
    * publishes it as one unit. Because readers resolve ONE pointer
    * (resolvePath) and version trees are immutable once flipped, a
    * consumer of a multi-part tree gets a MUTUALLY CONSISTENT snapshot
    * — the coherence unit is whatever `write` wrote, which is how a
    * changed-data index rebuild stays safe under concurrent searches
    * (SimilarityOps.saveIvfPqIndexAtomic). */
  def publishTree(spark: SparkSession, dir: String, artifact: String)(
      write: String => Unit): Unit = withPublishLease(dir, artifact) { lease =>
    val next = currentVersion(dir, artifact) + 1
    gcBareOrphan(dir, artifact, next)
    val vdir = versionDir(dir, artifact, next, lease.uid8)
    write(vdir)
    lease.renew() // the tree write was the long step
    lockFor(dir, artifact).synchronized {
      lease.assertStillOwner() // the flip gate: never flip a lost lease
      // belt: under the lease nobody else can have flipped — a raw
      // out-of-contract writer is detected here, not silently shadowed
      require(currentVersion(dir, artifact) < next,
        s"publish collision on $dir/$artifact: version $next no longer " +
          "newest at flip time (out-of-contract concurrent writer?)")
      flipPointer(dir, artifact, next, lease.uid8)
      // the legacy flat tree gets the SAME one-cycle grace as a
      // previous version dir: on the migration flip (next == 1) a
      // concurrent reader may be mid-scan over it, so it is retired by
      // the NEXT publish/compact (recover destructive also drops
      // pointer-shadowed legacy trees), not inside this lock
      val legacy = s"$dir/$artifact"
      if (next > 1 && LakeFs.exists(legacy)) LakeFs.deleteTree(legacy)
      gcStale(dir, artifact, next)
      spark.catalog.refreshByPath(vdir)
    }
  }

  /** Restore after a crash, per the class-doc matrix. `destructive =
    * false` (the read path) performs only the RESTORE actions —
    * finishing a completed fold's side delete and un-parking a
    * pre-pointer `.compact_old`. Dropping pre-flip fold markers,
    * orphan version trees and stale legacy/old dirs is left to the
    * compact path: those states are also exactly what an in-flight
    * rewrite looks like, and only compact (serialized by the lock) can
    * know the difference. */
  private def recover(spark: SparkSession, dir: String, artifact: String,
      destructive: Boolean = false): Unit = lockFor(dir, artifact).synchronized {
    val marker = foldMarkerPath(dir, artifact)
    val curV = currentVersion(dir, artifact)
    if (LakeFs.exists(marker)) {
      val content = LakeFs.readString(marker).trim
      // an r9 binary wrote EMPTY markers and disambiguated by tmp-dir
      // presence: empty marker + no .compact_tmp + no pointer is the
      // r9 completed-fold crash state (side rows already folded into
      // the legacy flat main) — it must finish the side delete like
      // the pointer-era completed fold, or read() double-counts and a
      // later fold folds the rows twice, permanently
      val r9CompletedFold = content.isEmpty && curV == 0 &&
        !LakeFs.exists(s"$dir/$artifact.compact_tmp")
      if ((curV > 0 && content == s"v$curV") || r9CompletedFold) {
        // fold flip completed, crash before the side delete — finish it
        LakeFs.deleteTree(streamPath(dir, artifact))
        LakeFs.deleteFile(marker)
      } else if (destructive) LakeFs.deleteFile(marker) // pre-flip leftover
    }
    // pre-pointer (r9) crash state: the live artifact parked at
    // `.compact_old` with nothing else resolvable — restore it
    val old = s"$dir/$artifact.compact_old"
    if (LakeFs.exists(old)) {
      if (curV == 0 && !LakeFs.exists(s"$dir/$artifact")) {
        LakeFs.rename(old, s"$dir/$artifact")
        spark.catalog.refreshByPath(s"$dir/$artifact")
      } else if (destructive) LakeFs.deleteTree(old)
    }
    if (destructive) {
      gcStale(dir, artifact, curV)
      // pre-pointer rewrite scratch
      val tmp = s"$dir/$artifact.compact_tmp"
      if (LakeFs.exists(tmp)) LakeFs.deleteTree(tmp)
      // a legacy tree shadowed by a published pointer is a crash
      // leftover of the flip→retire window — the pointer is always
      // newest (class doc), so the legacy bytes are stale
      if (curV > 0 && LakeFs.exists(s"$dir/$artifact"))
        LakeFs.deleteTree(s"$dir/$artifact")
    }
  }

  /** the main artifact read through its pinned sidecar schema (column
    * order AND types), regardless of physical layout — shared by read()
    * and the non-fold rewrite so compact and queries can never disagree
    * on the pinned schema */
  private def readMain(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    val p = resolvePath(dir, artifact)
    if (p != s"$dir/$artifact")
      require(LakeFs.exists(p),
        s"index artifact $artifact: pointer names a missing tree $p " +
          "(externally deleted?)")
    val main = spark.read.parquet(p)
    val sc = sidecarPath(dir, artifact)
    // the sidecar probe+read runs under the artifact lock: rewrite()
    // republishes the sidecar inside the same lock, so an in-process
    // reader can never observe the replace mid-flight (the cross-process
    // twin is writeStringAtomic's promote — old or new bytes, never a
    // truncated file; a concurrent reader once caught DataType.fromJson
    // on an empty sidecar exactly here)
    val schemaJson = lockFor(dir, artifact).synchronized {
      if (LakeFs.exists(sc)) Some(LakeFs.readString(sc)) else None
    }
    schemaJson match {
      case Some(json) =>
        val schema = DataType.fromJson(json).asInstanceOf[StructType]
        main.select(schema.fields.toSeq
          .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => main
    }
  }

  /** true when `path` holds at least one committed data file — a
    * just-created sink dir (only `_temporary`/`_spark_metadata`
    * scaffolding, no committed part files yet) must read as "no side
    * rows", not explode schema inference. Committed files never
    * disappear outside the fold maintenance window, so a positive
    * probe cannot go stale under a concurrent append. */
  private def hasDataFile(path: String): Boolean = {
    val fs = LakeFs.fs(path)
    def walk(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") &&
          (if (st.isDirectory) walk(st.getPath) else true)
      }
    walk(new org.apache.hadoop.fs.Path(path))
  }

  /** read an index artifact with its recorded schema restored (column
    * order AND types) regardless of physical layout, unioned with any
    * streaming side-artifact rows not yet folded in */
  def read(spark: SparkSession, dir: String, artifact: String): DataFrame = {
    recover(spark, dir, artifact)
    val pinned = readMain(spark, dir, artifact)
    val side = streamPath(dir, artifact)
    if (LakeFs.exists(side) && hasDataFile(side)) {
      val stream = spark.read.parquet(side)
      pinned.unionByName(stream.select(pinned.schema.fields.toSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*))
    } else pinned
  }

  /** rewrite one artifact: read through the pinned schema (optionally
    * folding the streaming side-artifact), repartition on the cell
    * key, write the next version dir, flip the pointer */
  private def rewrite(spark: SparkSession, dir: String, artifact: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      foldStream: Boolean): Unit = withPublishLease(dir, artifact) { lease =>
    recover(spark, dir, artifact, destructive = true)
    val sidePath = streamPath(dir, artifact)
    // non-fold: main artifact only — an active ingest keeps appending
    // to the side-artifact undisturbed; read() unions it at query time
    val cur =
      if (foldStream) read(spark, dir, artifact)
      else readMain(spark, dir, artifact)
    val schemaJson = cur.schema.json
    val next = currentVersion(dir, artifact) + 1
    gcBareOrphan(dir, artifact, next)
    val vdir = versionDir(dir, artifact, next, lease.uid8)
    val shaped =
      if (partitionCols.nonEmpty)
        cur.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else cur.repartition(cur.sparkSession.sessionState.conf.numShufflePartitions)
    val w = shaped.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(vdir)
    lease.renew() // the rewrite was the long step
    // sidecar first (layout-independent content: same columns before
    // and after the flip), then — when folding — the fold marker
    // naming the target version (recover() compares it to the current
    // pointer to finish or undo the side delete after any crash), then
    // THE FLIP: one zero-byte pointer-marker create. Every crash point
    // leaves a recoverable, schema-pinned, not-double-counted artifact
    // (see the class-doc matrix). The publish runs under the artifact
    // lock so a concurrent read()'s recovery can neither misread the
    // marker mid-write nor GC the tree being published.
    lockFor(dir, artifact).synchronized {
      lease.assertStillOwner() // the flip gate: never flip a lost lease
      // atomic replace, not create(overwrite): the sidecar is the one
      // pointer-layout file rewritten IN PLACE, and a cross-process
      // reader must see old-or-new bytes, never a truncated file
      LakeFs.writeStringAtomic(sidecarPath(dir, artifact), schemaJson)
      val folding = foldStream && LakeFs.exists(sidePath)
      // atomic too: an EMPTY marker is a meaningful r9-legacy state to
      // recover() (completed-fold disambiguation), so a cross-process
      // reader must never catch this write mid-truncate and misread a
      // pointer-era fold as that legacy state
      if (folding)
        LakeFs.writeStringAtomic(foldMarkerPath(dir, artifact), s"v$next")
      // belt: under the lease nobody else can have flipped — detect an
      // out-of-contract concurrent writer instead of shadowing it
      require(currentVersion(dir, artifact) < next,
        s"publish collision on $dir/$artifact: version $next no longer " +
          "newest at flip time (out-of-contract concurrent writer?)")
      flipPointer(dir, artifact, next, lease.uid8)
      if (folding) {
        LakeFs.deleteTree(sidePath)
        LakeFs.deleteFile(foldMarkerPath(dir, artifact))
      }
      // the legacy tree (pre-pointer artifact) gets one cycle of grace
      // like any previous version: the migration flip (next == 1)
      // leaves it for the next publish/compact to retire — a
      // concurrent reader may still be scanning it
      val legacy = s"$dir/$artifact"
      if (next > 1 && LakeFs.exists(legacy)) LakeFs.deleteTree(legacy)
      gcStale(dir, artifact, next)
      // the publish happened outside Spark's writers: drop any cached
      // file listings for the artifact paths or later scans chase
      // stale trees
      spark.catalog.refreshByPath(vdir)
      spark.catalog.refreshByPath(legacy)
    }
  }

  /** number of parquet data files under an artifact's live tree (spec
    * observability) */
  def dataFileCount(dir: String, artifact: String): Long = {
    val root = resolvePath(dir, artifact)
    if (!LakeFs.exists(root)) 0L
    else {
      val fs = LakeFs.fs(root)
      def walk(p: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(p).map { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
        }.sum
      walk(new org.apache.hadoop.fs.Path(root))
    }
  }

  /** Compact whatever index lives at `dir`: an IVF-PQ index (has
    * `codes.parquet`) gets centroid_id-partitioned codes; a text dedup
    * index (has `bands.parquet`) gets band_idx-partitioned bands and
    * coalesced fps/sigs. `foldStream = true` additionally merges the
    * flat streaming side-artifacts into the rewrite and removes them —
    * legal only with ingest STOPPED (see class doc). Returns the
    * artifacts rewritten. */
  def compact(spark: SparkSession, dir: String,
      foldStream: Boolean = false): Seq[String] = {
    // restore any crash-parked artifact BEFORE the existence probes —
    // a pre-pointer crash can leave only `.compact_old`, which must
    // count as the artifact being present. NON-destructive (r11): the
    // destructive sweep (gcStale, marker/scratch drops) deletes trees,
    // so it may only run under the publish lease — rewrite() does it
    // as its own first step, lease held.
    for (a <- Seq("codes.parquet", "bands.parquet", "fps.parquet", "sigs.parquet"))
      recover(spark, dir, a)
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    if (artifactExists(dir, "codes.parquet")) {
      // one directory per IVF cell; rows within a file sorted by
      // (vec_id, sub) so ADC scans run sequentially. At larger nlist
      // the repartition key keeps one shuffle partition per cell —
      // file count tracks nlist, not ingest history.
      rewrite(spark, dir, "codes.parquet",
        Seq("centroid_id"), Seq("vec_id", "sub"), foldStream)
      done += "codes.parquet"
    }
    if (artifactExists(dir, "bands.parquet")) {
      rewrite(spark, dir, "bands.parquet",
        Seq("band_idx"), Seq("band_hash", "doc_id"), foldStream)
      done += "bands.parquet"
      for (flat <- Seq("fps.parquet", "sigs.parquet")
          if artifactExists(dir, flat)) {
        rewrite(spark, dir, flat, Seq.empty, Seq.empty, foldStream)
        done += flat
      }
    }
    require(done.nonEmpty, s"no index artifacts found under $dir")
    done.toSeq
  }
}
