package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Index-store layout (Jane: PostgreSQL tables; graft: partitioned parquet).
  *
  * The store is written day-partitioned on event time so FDSN time-window
  * params become directory-level partition pruning at 100 TB — the scan
  * never lists, let alone reads, out-of-window days. Bucketing on the key
  * columns (saveAsTable path) additionally co-locates the frequent joins.
  */
object ParquetStore {

  /** Write `df` partitioned by the calendar day of `tsCol`. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_day", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_day")
      .parquet(path)

  /** Read back; time predicates on `p_day` prune partitions at planning. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a geo index partitioned by the 10°×10° grid cell (the j20
    * cell key). A bbox/radius query then enumerates its covering cells as
    * predicates on the cell columns, and the scan prunes whole
    * directories BEFORE any exact geometry (haversine/ray-cast) runs —
    * the coarse-then-exact pattern every spatial index uses, expressed as
    * plain partition pruning. At 100 TB a 30°-wide bbox reads ~1.5% of
    * the corpus's directories instead of scanning everything.
    */
  def writeCellPartitioned(df: DataFrame, latCol: String, lonCol: String,
      path: String): Unit =
    df.withColumn("p_cell_lat", expr(s"CAST(floor($latCol / 10) AS BIGINT)"))
      .withColumn("p_cell_lon", expr(s"CAST(floor($lonCol / 10) AS BIGINT)"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_cell_lat", "p_cell_lon")
      .parquet(path)

  /** Cell predicates covering a bbox, for [[writeCellPartitioned]] stores:
    * AND these with the exact bbox filter to get pruning + exactness.
    */
  def cellRangeFilter(minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double): org.apache.spark.sql.Column =
    col("p_cell_lat").between(math.floor(minLat / 10).toLong, math.floor(maxLat / 10).toLong) &&
      col("p_cell_lon").between(math.floor(minLon / 10).toLong, math.floor(maxLon / 10).toLong)

  /** Small-files compaction — the maintenance pass every continuously
    * ingested store needs: streaming micro-batches, upserts, and wide
    * per-task writers accumulate many tiny files, and at 100 TB scan
    * throughput dies on per-file open/footer overhead and undersized row
    * groups (plus a listing/metadata entry per file). Rewrites the store
    * as ceil(bytes / targetBytes) files, installed with the same
    * rename-aside swap as the streaming upsert sink so no reader ever
    * sees a missing or half-written store, and an interrupted swap
    * leaves `path` or `path.old` holding the complete pre-compaction
    * data. Compaction is pure layout — content-identical by
    * construction (spec-asserted). Returns the target file count.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compact")
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    // heal an interrupted swap (the upsertSink rule): if the store is
    // missing, the aside copy IS the store — a failed heal must abort,
    // since proceeding would read nothing and then delete the only copy
    if (!fs.exists(p) && fs.exists(old) && !fs.rename(old, p))
      throw new java.io.IOException(s"compact: cannot heal $old -> $p")
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"compact: cannot install $tmp at $path")
    fs.delete(old, true)
    n
  }

  /** Overwrite-install `df` at `path` without ever exposing a partial
    * store: write to a UNIQUE sibling temp dir, then publish with the
    * compact/upsertSink rename-aside swap. SaveMode.Overwrite deletes the
    * target first and then writes file by file — a concurrent reader of
    * the same fixed store path (the r6 ADVICE race: Verify and Bench on
    * one SF) can plan against part files that vanish mid-write. Here the
    * new store becomes visible in one rename, the unique temp name keeps
    * two concurrent builders from trampling each other's scratch, and an
    * interrupted swap leaves `path` or `path.old` holding a complete
    * store (healed by [[compact]]'s rule).
    */
  def installOverwrite(df: DataFrame, path: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).parquet(tmp))

  /** [[installOverwrite]] for a TEXT feed: CSV with a per-file header
    * (the reader's `header=true` skips one line per part file, so a
    * header written per file is the only layout that survives an
    * arbitrary partition count). Same rename-aside swap.
    */
  def installOverwriteCsv(df: DataFrame, path: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).option("header", "true").csv(tmp))

  /** [[installOverwrite]] for a raw LINE feed (one record per line —
    * the JSON-lines ingest shape): `df` must be a single STRING column.
    * No per-file header concerns (text has no header row), same
    * rename-aside swap. */
  def installOverwriteText(df: DataFrame, path: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).text(tmp))

  /** [[installOverwrite]] to ORC (the columnar interchange format
    * [[Ingest.readOrcEvents]] reads back): same rename-aside swap. */
  def installOverwriteOrc(df: DataFrame, path: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).orc(tmp))

  /** [[installOverwrite]] to XML via Spark 4.1's native XML writer (one
    * `rowTag` element per row, every part file wrapped in its own
    * `rootTag` document). The per-file ROOT is load-bearing, not
    * cosmetic — measured on this Spark (r19, ProbeXml): a file that is
    * just repeated rowTag elements with no enclosing root parses its
    * FIRST element and swallows the rest into one corrupt record, so a
    * text-lines install (the JSON-feed shape) cannot carry XML. The
    * writer is the only layout that keeps every file a well-formed
    * document under an arbitrary partition count — the same per-file
    * concern [[installOverwriteCsv]] solves for headers. Same
    * rename-aside swap. */
  def installOverwriteXml(df: DataFrame, path: String,
      rowTag: String, rootTag: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).format("xml")
        .option("rowTag", rowTag).option("rootTag", rootTag).save(tmp))

  /** [[installOverwrite]] PARTITIONED by a column (hive-style
    * `col=value/` subdirectories): the layout that turns a time-travel
    * or day-scoped predicate into PARTITION PRUNING at the scan — the
    * pruned directories are never listed into the plan, so a query for
    * day <= T reads |T| partitions of a 100 TB store instead of
    * filtering all of it. Same rename-aside swap (the partition dirs
    * move with their parent). */
  def installOverwritePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    installVia(df, path)(tmp =>
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp))

  private def installVia(df: DataFrame, path: String)(
      writeTo: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path.install-${java.util.UUID.randomUUID().toString.take(8)}")
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    // tmp is deleted on ANY failure path (r13 ADVICE: a write that
    // throws before the swap must not leak .install-<uuid> scratch
    // dirs under /tmp/graft_stores); after a successful swap the
    // rename has consumed tmp and the finally is a no-op. The cleanup
    // itself is guarded so a delete failure (file still held by a
    // terminating task) can never REPLACE the primary exception.
    // EXCEPT (r14, the r13 ADVICE): if the failure happened AFTER the
    // live store was renamed aside — `path` absent, fully-written tmp
    // present — tmp is the freshest complete copy and deleting it would
    // leave only `.old`; keep it and log its path so recovery doesn't
    // depend solely on compact's heal rule or a rebuild.
    var written = false // tmp is COMPLETE only once writeTo returned
    try {
      writeTo(tmp.toString)
      written = true
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(p) && !fs.rename(p, old))
        throw new java.io.IOException(s"install: cannot move $path aside")
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"install: cannot install $tmp at $path")
      fs.delete(old, true)
      // the new generation is live: reclaim stale install scratch (a
      // prior failed swap's kept recovery copy, age-expired siblings)
      sweepInstallScratch(fs, p)
    } finally {
      try if (fs.exists(tmp)) {
        if (!written || fs.exists(p)) fs.delete(tmp, true)
        else {
          System.err.println(
            s"install: swap failed after move-aside; keeping fresh build at " +
              s"$tmp (prior generation at $old)")
          // record WHICH sibling is the kept recovery copy (r15 ADVICE):
          // a later successful install (or a valid-marker serve) can
          // then reclaim exactly this dir REGARDLESS of age — within
          // the 1 h gate the common failed-swap-then-quick-rebuild
          // sequence otherwise leaks the full-store copy forever once
          // the store's staleness marker validates. The marker is
          // written only for a COMPLETE tmp (written = true), so the
          // recorded dir can never be an in-flight write. A SECOND
          // consecutive failed swap must not orphan the first kept
          // copy by overwriting its record (r15 review): this newer
          // complete tmp supersedes it, so the previously recorded
          // copy is reclaimed before the marker is rewritten.
          try {
            val marker = keptMarker(p)
            if (fs.exists(marker)) {
              val prev = readKeptMarker(fs, marker)
              if (prev.startsWith(s"${p.getName}.install-") &&
                  prev != tmp.getName) {
                val dir = new org.apache.hadoop.fs.Path(p.getParent, prev)
                if (fs.exists(dir)) fs.delete(dir, true)
              }
            }
            val out = fs.create(marker, true)
            try out.write(tmp.getName.getBytes("UTF-8")) finally out.close()
          } catch { case e: Throwable =>
            System.err.println(s"install kept-copy marker ($tmp): $e") }
        }
      } catch { case e: Throwable =>
        System.err.println(s"install cleanup ($tmp): $e") }
    }
  }

  /** `$path.install-kept` — names the recovery copy a failed swap kept. */
  private def keptMarker(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p.getParent, s"${p.getName}.install-kept")

  /** The dir name a kept-copy marker records ("" when unreadable).
    * Reads until EOF (r16, the r15 ADVICE): the single-read contract is
    * not guaranteed by FSDataInputStream — a short read would truncate
    * the recorded name, the prefix check would reject it, and the
    * marker would be consumed as corrupt, leaking the kept copy until
    * the age sweep. Names are tiny; 256 bytes bounds any real marker.
    */
  private def readKeptMarker(fs: org.apache.hadoop.fs.FileSystem,
      kept: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(kept)
    try {
      val buf = new Array[Byte](256)
      var off = 0
      var n = in.read(buf, off, buf.length - off)
      while (n > 0 && off + n < buf.length) {
        off += n
        n = in.read(buf, off, buf.length - off)
      }
      if (n > 0) off += n
      new String(buf, 0, off, "UTF-8").trim
    } finally in.close()
  }

  /** Newest modification time at or under `p` (r15 ADVICE): the stale-
    * scratch age gate keys off the RECURSIVE max, not the top-level dir
    * mtime — during a long Spark write the task output lands under
    * `_temporary/` while the `.install-` dir keeps its creation mtime,
    * so a legitimately slow (>1 h) concurrent write would otherwise
    * look age-expired and get swept mid-write. Cost is bounded: scratch
    * trees are one store's part files, and the sweep only recurses into
    * `.install-` siblings (normally none exist).
    */
  private def newestMtime(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val st = fs.getFileStatus(p)
    var mx = st.getModificationTime
    if (st.isDirectory)
      fs.listStatus(p).foreach { c =>
        mx = math.max(mx, newestMtime(fs, c.getPath))
      }
    mx
  }

  /** Reclaim stale install scratch next to store path `p`. Two classes:
    * (a) the recovery copy a prior run's failed swap KEPT — its name is
    * recorded in the `.install-kept` marker, and since the caller holds
    * a complete live store at `p`, that copy is provably stale and is
    * reclaimed regardless of age (the r15 ADVICE leak: a quick rebuild
    * after the failure left the copy younger than the age gate, and the
    * now-valid staleness marker meant no later install ever swept it);
    * (b) any other `.install-` sibling older than 1 h by NEWEST
    * RECURSIVE mtime (see [[newestMtime]]) — an unrecorded leak from a
    * crashed JVM. A sibling younger than the gate could be another
    * JVM's in-flight write for the same path (Verify and Bench can race
    * on a shared store) and is never touched. When NO live store exists
    * at `p` a second-tier 24 h cutoff applies instead (r16, the r15
    * ADVICE: orphans of a never-served store otherwise leaked forever).
    * The marker-recorded kept copy is spared in BOTH tiers (r17, the
    * r16 ADVICE: a concurrent installer failing its swap between the
    * liveness sample and the deletes leaves a kept copy that can
    * already be age-expired by preserved mtimes) — the marker is read
    * at sweep start AND re-validated immediately before each delete,
    * shrinking the race to the single read-vs-delete instant; a racy
    * re-read failure skips that one delete instead of aborting the
    * remaining orphans (r18, the r17 ADVICE). Store-less only, a third
    * class: (c) a DANGLING kept marker — recorded dir gone, marker
    * older than the 24 h gate — is consumed (r18, the r17 ADVICE: it
    * was excluded from sweeping by name and only the live-store branch
    * ever consumed markers, so it leaked forever). Never throws:
    * scratch reclamation must not fail an install or a serve.
    */
  private[sources] def sweepInstallScratch(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    try {
      val kept = keptMarker(p)
      if (fs.exists(kept)) {
        val name = readKeptMarker(fs, kept)
        // the recorded name is installer-generated (`<store>.install-<8
        // hex>`); the prefix check keeps a corrupt marker from ever
        // deleting something that is not this store's install scratch.
        // The live store is re-checked IMMEDIATELY before the delete
        // (r15 review): between the caller's staleness check and this
        // sweep, a concurrent installer can move the live store aside
        // and fail ITS swap — at which point the recorded copy may be
        // the freshest complete data again and must survive (marker
        // kept too, so a later healthy serve retries the reclaim).
        if (name.startsWith(s"${p.getName}.install-")) {
          if (fs.exists(p)) {
            val dir = new org.apache.hadoop.fs.Path(p.getParent, name)
            if (fs.exists(dir)) fs.delete(dir, true)
            fs.delete(kept, false)
          }
        } else fs.delete(kept, false) // corrupt marker: consume, touch nothing
      }
    } catch { case e: Throwable =>
      System.err.println(s"install kept-copy sweep ($p): $e") }
    sweepAgedSiblings(fs, p)
  }

  /** The age-tier half of [[sweepInstallScratch]], split out (r17) so
    * the mid-race state — live store present AND a kept marker written
    * by a concurrent installer AFTER the kept-copy branch above ran —
    * is directly constructible in a spec. Never throws.
    */
  private[graft] def sweepAgedSiblings(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    try {
      val parent = p.getParent
      if (parent != null && fs.exists(parent)) {
        val live = fs.exists(p)
        // like the kept-copy branch, the 1 h sweep only runs beside a
        // LIVE store (r15 review): in the mid-recovery state (store
        // moved aside by a failed concurrent swap) an aged sibling can
        // be the freshest complete copy, and reclamation can always
        // wait for the next healthy serve/install. Second tier (r16,
        // the r15 ADVICE): without a live store the sweep previously
        // never ran, so scratch from a crashed build of a store that
        // is never served again leaked under /tmp forever. A DAY-old
        // sibling cannot be an in-flight write (the recovery window is
        // minutes), so it sweeps even store-less — EXCEPT the
        // marker-recorded kept copy, which in that state may be the
        // freshest complete data and keeps waiting for the next
        // healthy serve/install (the marker survives with it).
        val cutoff = System.currentTimeMillis() -
          (if (live) 3600L * 1000 else 24L * 3600 * 1000)
        // marker re-read UNCONDITIONALLY, live or not (r17, the r16
        // ADVICE): `live` was sampled above, and a concurrent
        // installer's swap can fail between that sample and the deletes
        // below — its just-kept recovery copy can already exceed the 1 h
        // gate by recursive mtime (rename preserves file mtimes), so the
        // live tier would sweep it and leave a dangling marker. The
        // kept-copy branch of sweepInstallScratch normally consumed
        // marker + copy when live, so a marker existing HERE is exactly
        // the race window; excluding its recorded name costs one
        // exists+read per sweep.
        val km = keptMarker(p)
        def recordedKept(): Option[String] =
          if (fs.exists(km)) Some(readKeptMarker(fs, km)).filter(_.nonEmpty)
          else None
        val keptName = recordedKept()
        // dangling-marker reclamation (r18, the r17 ADVICE): a marker
        // whose recorded directory no longer exists is excluded from the
        // sibling sweep by name forever and is only consumed by the
        // kept-copy branch when a LIVE store exists — in the store-less
        // tier a stale marker file would persist indefinitely. A DAY-old
        // marker with no recorded dir cannot belong to an in-flight
        // install (the same argument as the store-less sibling tier), so
        // consume it here; a younger one may be mid-race (its dir moving
        // or another sweep consuming) and waits. Failure-isolated: a
        // racy marker/dir read must not abort the sibling sweep below.
        // Residual race (r19, the r18 ADVICE inventory note): the
        // mtime read → fs.delete pair is non-atomic — a concurrent
        // installer rewriting THIS marker between the two loses its
        // fresh marker, leaving its kept copy unprotected until the
        // 24 h store-less sweep. Same single read-vs-delete instant
        // the per-delete re-validation below already accepts, and only
        // a diagnosis marker is at stake; accepted, not closed.
        if (!live) keptName.foreach { n =>
          try {
            val dir = new org.apache.hadoop.fs.Path(parent, n)
            if (!fs.exists(dir) &&
                fs.getFileStatus(km).getModificationTime < cutoff) {
              fs.delete(km, false); ()
            }
          } catch { case e: Throwable =>
            System.err.println(s"dangling kept-marker sweep ($km): $e") }
        }
        fs.listStatus(parent)
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith(s"${p.getName}.install-") &&
              n != km.getName && !keptName.contains(n)
          }
          // per-sibling guard (r16 review): a sibling another JVM
          // consumes between listStatus and the recursive stat throws
          // FileNotFound — already-reclaimed, skip it rather than
          // aborting the sweep of the remaining aged orphans
          .filter(st =>
            try newestMtime(fs, st.getPath) < cutoff
            catch { case _: java.io.FileNotFoundException => false })
          // marker re-validated at the LAST instant (r17 review): the
          // recursive mtime walk above can take seconds on a large
          // scratch tree, and a swap failing INSIDE that window records
          // a kept copy the sweep-start read missed. Deletes are rare
          // (normally zero), so the extra exists+read per delete is
          // free; the residual window is the single read-vs-delete
          // instant, not the whole walk.
          .foreach { st =>
            // a read failure here is treated as "marker present" for
            // THIS sibling only (r18, the r17 ADVICE): a concurrent
            // sweep can consume the marker between fs.exists and the
            // read, and letting the throw reach the outer catch would
            // abort deletion of all remaining aged orphans — the same
            // mid-iteration failure mode the r16 per-sibling mtime
            // guard closed. Skipping one delete is always safe (the
            // next sweep retries); the loop continues.
            val keptNow =
              try recordedKept()
              catch { case e: Throwable =>
                // logged (r18 review): a DURABLE read failure (perms,
                // corruption) skips every delete on every sweep — that
                // must stay diagnosable from stderr, not silent
                System.err.println(
                  s"aged-orphan marker re-read (${st.getPath}): $e")
                Some(st.getPath.getName)
              }
            if (!keptNow.contains(st.getPath.getName))
              fs.delete(st.getPath, true)
          }
      }
    } catch { case e: Throwable =>
      System.err.println(s"install stale-scratch sweep ($p): $e") }
  }

  /** Source-content stamp for store-staleness markers: a digest of the
    * (name, length, mtime) of every file under the source table —
    * METADATA-only, no scan. A driver-side regeneration that keeps row
    * counts but changes bytes (the r7→r8 events.ts pattern) changes the
    * stamp, where a count-only marker would silently validate a store
    * built from the previous generation.
    */
  def sourceStamp(path: String): String = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return "missing"
    val walk = java.nio.file.Files.walk(root)
    try {
      val items = walk.iterator()
      val crc = new java.util.zip.CRC32()
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      while (items.hasNext) {
        val f = items.next()
        if (java.nio.file.Files.isRegularFile(f))
          lines += s"${root.relativize(f)}:${java.nio.file.Files.size(f)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}"
      }
      lines.sorted.foreach(l => crc.update(l.getBytes("UTF-8")))
      java.lang.Long.toHexString(crc.getValue)
    } finally walk.close()
  }

  /** The serving-store build-once guard (d34/d35/t36 convention, held in
    * ONE place): when the marker file matches `want` and every store
    * path exists, the build is skipped; otherwise `build` runs and the
    * marker publishes LAST — stores install atomically first, so a
    * failed build never validates.
    */
  def buildIfStale(metaPath: String, want: String, storePaths: Seq[String])(
      build: => Unit): Unit = {
    val meta = java.nio.file.Paths.get(metaPath)
    val valid = java.nio.file.Files.exists(meta) &&
      new String(java.nio.file.Files.readAllBytes(meta), "UTF-8") == want &&
      storePaths.forall(p => new java.io.File(p).exists)
    // Scratch sweep on BOTH branches, before any build (r16, the r15
    // ADVICE): the valid-branch-only sweep meant a store whose build
    // keeps crashing — never valid, never successfully installed —
    // accumulated orphan `.install-` scratch forever. The sweep's
    // store-less second-tier 24 h gate makes the pre-build call safe:
    // a failed prior build's day-old orphans reclaim here, while any
    // fresh sibling (or the marker-recorded kept copy) survives. On
    // the valid path this is the serve-time sweep that closes the r15
    // kept-copy leak. Guarded + metadata-only (one listStatus per
    // store path, recursion only into `.install-` siblings, which
    // normally don't exist).
    try {
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      storePaths.foreach { sp =>
        val p = new org.apache.hadoop.fs.Path(
          new java.io.File(sp).getAbsolutePath)
        sweepInstallScratch(p.getFileSystem(conf), p)
      }
    } catch { case e: Throwable =>
      System.err.println(s"buildIfStale scratch sweep ($metaPath): $e") }
    if (!valid) {
      build
      java.nio.file.Files.createDirectories(meta.getParent)
      java.nio.file.Files.write(meta, want.getBytes("UTF-8"))
      // A rebuild swaps the files under storePaths; any table already
      // registered over one of them (registerBucketed) would keep a
      // cached file index pointing at the deleted generation — a later
      // serve could FileNotFound or read stale data (r13 ADVICE).
      // refreshByPath invalidates exactly the relations rooted at the
      // swapped paths; no-op when nothing is registered.
      org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
        storePaths.foreach(p =>
          s.catalog.refreshByPath(new java.io.File(p).getAbsolutePath))
      }
    }
  }

  /** Write a table bucketed (and sorted) on its join key. Two tables
    * bucketed the same way join with NO shuffle on either side — at 100 TB
    * the lineitem⋈orders join becomes a per-bucket sort-merge with zero
    * network movement, paid once at write time instead of per query.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** [[writeBucketed]] to an EXPLICIT location with the rename-aside
    * install discipline (the r12 serving-store form): the bucketed
    * writer only runs through `saveAsTable`, so the files are written
    * via a throwaway catalog entry pointing at a unique temp dir, the
    * entry is dropped (external — metadata only, the files stay), and
    * the dir is published with the same atomic swap as
    * [[installOverwrite]] — no reader window without a complete store,
    * interrupted swaps heal by [[compact]]'s rule. Bucket-id file
    * naming survives the rename, so [[registerBucketed]] can attach
    * the layout in any later session. Pairs with [[buildIfStale]] for
    * the pay-once-at-write lifecycle.
    */
  def writeBucketedAt(df: DataFrame, path: String, bucketCol: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    val scratch = s"graft_bucketed_build_${java.util.UUID.randomUUID().toString.take(8).replace('-', '_')}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path.install-${java.util.UUID.randomUUID().toString.take(8)}")
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    // the throwaway catalog entry and the scratch dir are both dropped
    // on ANY failure path (r13 ADVICE: repeated failed builds must not
    // accumulate junk in the session catalog or under /tmp); after a
    // successful swap the rename has consumed tmp and both finally
    // actions are no-ops. Each cleanup is independently guarded: a
    // DROP TABLE on a broken/stopped session must neither mask the
    // primary exception nor skip the tmp delete.
    try {
      df.write.mode(SaveMode.Overwrite)
        .format("parquet")
        .option("path", tmp.toString)
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(scratch)
      s.sql(s"DROP TABLE IF EXISTS $scratch")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(p) && !fs.rename(p, old))
        throw new java.io.IOException(s"writeBucketedAt: cannot move $path aside")
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"writeBucketedAt: cannot install $tmp at $path")
      fs.delete(old, true)
    } finally {
      try s.sql(s"DROP TABLE IF EXISTS $scratch")
      catch { case e: Throwable =>
        System.err.println(s"writeBucketedAt cleanup ($scratch): $e") }
      try if (fs.exists(tmp)) fs.delete(tmp, true)
      catch { case e: Throwable =>
        System.err.println(s"writeBucketedAt cleanup ($tmp): $e") }
    }
  }

  /** Attach an existing [[writeBucketedAt]] store to THIS session's
    * catalog (the in-memory catalog forgets tables between JVMs; the
    * bucketed layout on disk does not). Metadata-only — no scan, no
    * write: the CREATE TABLE declares the same CLUSTERED/SORTED spec
    * the files were written with, so co-bucketed joins plan with zero
    * Exchange in every session that reads the store. No-op when the
    * table is already registered.
    */
  def registerBucketed(spark: SparkSession, table: String, path: String,
      schemaDdl: String, bucketCol: String, buckets: Int): Unit =
    if (!spark.catalog.tableExists(table))
      spark.sql(
        s"""CREATE TABLE $table ($schemaDdl) USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
}
