package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-read conveniences over evolving parquet layouts. */
object Lake {

  /** Copy-on-write MERGE into a hive-partitioned parquet target —
    * the Delta-style `MERGE INTO` shape without a table format:
    * apply a CDC delta (latest-state upserts; `op = 'd'` rows are
    * deletes) by rewriting ONLY the partitions that contain affected
    * keys. Mechanics: the delta's distinct partition values prune the
    * target read (partition pruning — reads the touched slice, never
    * the corpus), old versions of delta keys are anti-joined away,
    * upserts union in, and `partitionOverwriteMode=dynamic` swaps in
    * just the rewritten partition directories — untouched partitions'
    * files are never read, rewritten, or moved (spec pins file
    * identity). At 100 TB with daily deltas touching k of N
    * partitions, the run costs O(k/N · corpus), not O(corpus).
    * Caveats of the format-less shape (why Delta/Iceberg exist):
    * the swap is atomic per partition directory, not across the
    * table, and concurrent writers need external fencing.
    * PRECONDITION — partition column stable per key (the Hudi
    * non-global-index contract): touched partitions are derived from
    * the DELTA's partition values only, so a delta row that MOVES a
    * key to a different partition leaves the key's old row in the
    * now-untouched partition (a duplicate). If keys can migrate,
    * derive touched partitions from a target-side key lookup too, or
    * route through a table format with a global index. */
  def mergeIntoPartitioned(spark: SparkSession, targetDir: String,
      partCol: String, keyCol: String, delta: DataFrame,
      opCol: String = "op"): Unit = {
    import org.apache.spark.sql.functions.col
    val touched = delta.select(col(partCol)).distinct()
      .collect().map(_.get(0)) // driver state: touched-partition VALUES
    if (touched.isEmpty) return
    val target = spark.read.parquet(targetDir)
      .filter(col(partCol).isin(touched.toIndexedSeq: _*))
    val keys = delta.select(col(keyCol)).distinct()
    val kept = target.join(keys, Seq(keyCol), "left_anti")
    val upserts = delta.filter(col(opCol) =!= "d")
      .select(target.columns.map(col).toIndexedSeq: _*)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.unionByName(upserts)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partCol).parquet(targetDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Z-order layout write (H14) — multi-dimensional data clustering
    * for range-query pruning: each row's position on the Z-curve
    * interleaves the bits of its (normalized) values in `cols`, the
    * dataset is range-partitioned and sorted by that Z-value, and the
    * parquet row-group min/max stats come out TIGHT in EVERY listed
    * dimension at once (a plain sort gets tight stats in the leading
    * column only). A 2-D box predicate then skips all but the few
    * row groups whose rectangles intersect the box — the spec
    * measures the scan reading a fraction of what the same query
    * reads from an unclustered layout. At 100 TB this is the
    * difference between "point-ish lookups read the corpus" and
    * "point-ish lookups read megabytes"; re-cluster with the same
    * call after heavy appends. Normalization bounds come from one
    * tiny min/max aggregate (driver state: 2 doubles per column). */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      targetFiles: Int = 64): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size <= 4, "z-order over 1-4 columns")
    // clamp: 1 column would give bits = 32 and `1 << 32` overflows Int
    // to 1, silently collapsing every z-value to 0 (no clustering at
    // all); 20 bits ≈ 10⁶ buckets is already far beyond targetFiles
    val bits = math.min(32 / cols.size, 20)
    val aggCols = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val bucketCols = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getDouble(2 * i); val mx = stats.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      least(greatest(floor((col(c).cast("double") - mn) / span
        * (1 << bits)), lit(0)), lit((1 << bits) - 1)).cast("long")
    }
    // interleave: output bit (b · nCols + j) takes input bit b of col j
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      bucketCols.zipWithIndex.foldLeft(acc) { case (a, (bc, j)) =>
        a.bitwiseOR(shiftleft(shiftright(bc, b).bitwiseAND(1L),
          b * cols.size + j))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** H17 manifest-gated atomic publish — the minimal transactional
    * primitive the hand-rolled paths above acknowledge they lack
    * (C28/E9's append→marker window, H13's per-directory atomicity):
    * data files land under `data/` but are INVISIBLE until a manifest
    * names them, and readers resolve the current manifest through one
    * atomically-swapped pointer file. A crash at ANY point before the
    * pointer swap leaves readers on the previous version; orphaned
    * part-files from dead writers are never read (spec plants one).
    * This is the kernel of every table format: Delta's _delta_log,
    * Iceberg's snapshot manifests — reduced to the two operations the
    * engine's own state stores need (append a version, replace a
    * snapshot) under a SINGLE-WRITER contract (concurrent writers
    * need the formats' conditional-commit machinery — that is where
    * this primitive hands over). Local-FS rename is the atomic swap;
    * an object-store deployment substitutes its conditional put.
    * Old versions stay readable ([[readPublishedVersion]] — time
    * travel) until a retention pass deletes manifests. */
  object Manifest {
    private def fs(spark: SparkSession) =
      org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
    private def p(s: String) = new org.apache.hadoop.fs.Path(s)

    private def currentVersion(spark: SparkSession, dir: String): Long = {
      val f = fs(spark)
      if (!f.exists(p(s"$dir/_latest"))) 0L
      else {
        val in = f.open(p(s"$dir/_latest"))
        try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      }
    }

    private def manifestLines(spark: SparkSession, dir: String,
        version: Long): Seq[String] = {
      if (version == 0L) return Seq.empty
      val f = fs(spark)
      val in = f.open(p(f"$dir/_manifests/v$version%08d.manifest"))
      try scala.io.Source.fromInputStream(in).getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }

    private def manifestFiles(spark: SparkSession, dir: String,
        version: Long): Seq[String] =
      manifestLines(spark, dir, version)
        .filterNot(_.startsWith("#")).map(rel => s"$dir/$rel")

    /** Commit-log FACTS (`#meta ` lines) recorded by past publishes —
      * applied stream-batch ids and the like. Unlike file lists they
      * are carried forward into every successor manifest (append AND
      * snapshot), so one read of the CURRENT manifest answers "was
      * this batch ever applied?" even after compaction rewrote the
      * files and [[vacuum]] pruned the manifest that introduced it.
      * One short line per fact — negligible next to the file list. */
    def publishedMetas(spark: SparkSession, dir: String): Set[String] =
      manifestLines(spark, dir, currentVersion(spark, dir))
        .filter(_.startsWith("#meta ")).map(_.stripPrefix("#meta ")).toSet

    /** Meta lines in FIRST-COMMIT order. The Set view above answers
      * membership; state-carrying metas (e.g. the E33 cell-split
      * records, which redefine centroids and must replay in commit
      * order) need the sequence. `commit` appends fresh metas after
      * the carried ones and `distinct` keeps first occurrences, so
      * position in the current manifest IS commit order. */
    def publishedMetasOrdered(spark: SparkSession,
        dir: String): Seq[String] =
      manifestLines(spark, dir, currentVersion(spark, dir))
        .filter(_.startsWith("#meta ")).map(_.stripPrefix("#meta "))

    /** True once any version has been published under `dir`. */
    def isManaged(spark: SparkSession, dir: String): Boolean =
      currentVersion(spark, dir) > 0L

    private def writeFile(spark: SparkSession, path: String,
        content: String): Unit = {
      val f = fs(spark)
      val out = f.create(p(path), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

    /** Write `df` as a new version whose manifest lists `carry` (the
      * retained predecessor files) plus the newly written files, then
      * swap the pointer. Returns the published version.
      *
      * `partitionBy` lays the fresh files out under hive-style
      * `__p_<col>=<value>/` dirs WITHOUT dropping the columns from
      * the data (each is duplicated into a `__p_` twin before the
      * write) — readers stay plain file-list reads, and
      * [[readPublishedPruned]] prunes the list by path segment, the
      * Delta/Iceberg partition-pruning-from-the-log shape. (Catalyst
      * dir-inference can't prune here: versioned `data/vN/` roots
      * between basePath and the partition dirs raise
      * CONFLICTING_DIRECTORY_STRUCTURES.)
      *
      * Crash-retry safe: the data write is mode("overwrite") and the
      * manifest write overwrites, so a commit that died anywhere
      * before the pointer swap is simply redone — the orphan
      * `data/vNext` from the dead attempt is replaced, never
      * double-counted. */
    private def commit(df: DataFrame, dir: String, carry: Seq[String],
        partitionBy: Seq[String] = Nil, meta: String = ""): Long = {
      val spark = df.sparkSession
      val f = fs(spark)
      val cur = currentVersion(spark, dir)
      val next = cur + 1
      val sub = f"data/v$next%08d"
      if (partitionBy.isEmpty) df.write.mode("overwrite").parquet(s"$dir/$sub")
      else {
        val dup = partitionBy.foldLeft(df)((d, c) =>
          d.withColumn(s"__p_$c", d.col(c)))
        dup.write.mode("overwrite").partitionBy(partitionBy.map("__p_" + _): _*)
          .parquet(s"$dir/$sub")
      }
      val it = f.listFiles(p(s"$dir/$sub"), true)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString.split(s"/$sub/", 2) match {
            case Array(_, rest) => s"$sub/$rest"
            case _ => st.getPath.toString
          }
          fresh += rel
        }
      }
      val metas = (manifestLines(spark, dir, cur)
        .filter(_.startsWith("#meta ")) ++
        (if (meta.nonEmpty) Seq(s"#meta $meta") else Nil)).distinct
      val rels = metas ++ carry.map(_.stripPrefix(s"$dir/")) ++ fresh.sorted
      writeFile(spark, f"$dir/_manifests/v$next%08d.manifest",
        rels.mkString("\n"))
      // pointer swap LAST and atomically: readers see old-or-new only.
      // FileContext.rename(OVERWRITE) is the atomic-replace API —
      // FileSystem.rename silently refuses an existing destination
      writeFile(spark, s"$dir/_latest.tmp", next.toString)
      org.apache.hadoop.fs.FileContext
        .getFileContext(spark.sparkContext.hadoopConfiguration)
        .rename(p(s"$dir/_latest.tmp"), p(s"$dir/_latest"),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      next
    }

    /** Append-publish: new version = predecessor files + df's files.
      * `meta` (optional) records a commit-log fact — see
      * [[publishedMetas]]; `partitionBy` lays fresh files out for
      * [[readPublishedPruned]]. */
    def publishAppend(df: DataFrame, dir: String,
        partitionBy: Seq[String] = Nil, meta: String = ""): Long = {
      val spark = df.sparkSession
      commit(df, dir, manifestFiles(spark, dir, currentVersion(spark, dir)),
        partitionBy, meta)
    }

    /** Snapshot-publish: new version = df's files only (logical
      * replace; old data files remain for time travel). Meta lines
      * from the predecessor are still carried — a snapshot replaces
      * CONTENT, not commit-log history. */
    def publishSnapshot(df: DataFrame, dir: String,
        partitionBy: Seq[String] = Nil, meta: String = ""): Long =
      commit(df, dir, Seq.empty, partitionBy, meta)

    /** Replace-partition publish (the Delta `replaceWhere` shape):
      * new version = predecessor files MINUS every file under
      * `__p_<partCol>=<v>` for v in `dropValues`, PLUS `df`'s files
      * (laid out partitioned by `partCol`, which may land rows in
      * partitions OUTSIDE dropValues — those commit as ordinary
      * appends). One atomic pointer swap covers both the drop and
      * the add, so a reader never sees the partition half-replaced.
      *
      * REFUSES a table holding any file not attributable to a
      * `partCol` partition: a kept unattributable file could still
      * hold dropped-partition rows, silently duplicating them after
      * the replace — unlike pruning, replacement IS load-bearing.
      * Values match at every unescape depth (the pruned-read rule),
      * which can only over-DROP across escape collisions — the safe
      * direction here, since `df` re-supplies the dropped rows. */
    def publishReplacePartitions(df: DataFrame, dir: String,
        partCol: String, dropValues: Seq[String],
        meta: String = ""): Long = {
      val spark = df.sparkSession
      val all = manifestFiles(spark, dir, currentVersion(spark, dir))
      val prefix = s"__p_$partCol="
      val unattributed = all.filterNot(
        _.split("/").exists(_.startsWith(prefix)))
      require(unattributed.isEmpty,
        s"replace-partition needs a fully $partCol-partitioned table; " +
          s"unattributable files: ${unattributed.take(3).mkString(", ")}")
      val drop = dropValues.toSet
      val carry = all.filter { path =>
        val seg = path.split("/").find(_.startsWith(prefix)).get
        val raw = seg.substring(prefix.length)
        val once = unescapePathName(raw)
        !(drop.contains(raw) || drop.contains(once) ||
          drop.contains(unescapePathName(once)))
      }
      commit(df, dir, carry, Seq(partCol), meta)
    }

    /** Partition-pruned read of the current version: keep only the
      * files whose path carries `__p_<partCol>=<v>` for some wanted
      * `v` (files not under any `__p_<partCol>=` dir — e.g. from
      * unpartitioned commits — are kept unconditionally: pruning is
      * an optimization, never a filter; callers still apply the exact
      * predicate). The decision is driver-side string work on the
      * manifest's file list — zero FS listing, zero executor time —
      * which is the whole point at 100 TB: nProbe/k of the table's
      * files are opened, the rest never touched. */
    def readPublishedPruned(spark: SparkSession, dir: String,
        partCol: String, values: Seq[String]): DataFrame = {
      val all = manifestFiles(spark, dir, currentVersion(spark, dir))
      // compare in the UNESCAPED value domain: Spark percent-escapes
      // special characters (':', '=', '%', '#', ...) in partition
      // directory names and writes nulls as __HIVE_DEFAULT_PARTITION__;
      // matching raw strings against the escaped path segment would
      // silently drop matching files — violating the "pruning is an
      // optimization, never a filter" contract. Null-partition files
      // are kept unconditionally for the same reason.
      val wanted = values.toSet
      val prefix = s"__p_$partCol="
      val kept = all.filter { path =>
        val segs = path.split("/")
        val part = segs.find(_.startsWith(prefix))
        part.forall { seg =>
          val raw = seg.substring(prefix.length)
          // manifest paths carry URI percent-encoding ON TOP of the
          // Hive partition escaping ('%' itself becomes %25), so match
          // at every unescape depth — pruning is optimization-only, so
          // a false keep is harmless while a false drop loses rows
          val once = unescapePathName(raw)
          val twice = unescapePathName(once)
          raw == "__HIVE_DEFAULT_PARTITION__" ||
            wanted.contains(raw) || wanted.contains(once) ||
            wanted.contains(twice)
        }
      }
      if (kept.isEmpty) spark.read.parquet(all: _*).limit(0)
      else spark.read.parquet(kept: _*)
    }

    /** Inverse of Spark's partition-path escaping (Hive convention:
      * special characters become %XX with two uppercase hex digits).
      * Escapes decode to BYTES first and the byte run UTF-8-decodes
      * as a unit — a non-ASCII value encoded as UTF-8 pairs (é →
      * %C3%A9) must round-trip to 'é', not to the two mojibake chars
      * a char-wise decode produces (which would false-DROP matching
      * files in readPublishedPruned). A malformed escape passes
      * through verbatim rather than throwing, matching Spark's own
      * lenient unescape. */
    private[graft] def unescapePathName(s: String): String = {
      if (s.indexOf('%') < 0) return s
      val sb = new java.lang.StringBuilder(s.length)
      val bytes = new java.io.ByteArrayOutputStream(8)
      def flush(): Unit = if (bytes.size > 0) {
        sb.append(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
        bytes.reset()
      }
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          val code = try {
            Integer.parseInt(s.substring(i + 1, i + 3), 16)
          } catch { case _: NumberFormatException => -1 }
          if (code >= 0) { bytes.write(code); i += 3 }
          else { flush(); sb.append(c); i += 1 }
        } else { flush(); sb.append(c); i += 1 }
      }
      flush()
      sb.toString
    }

    /** Current published view; empty-but-typed is the caller's
      * concern — version 0 (nothing published) throws. */
    def readPublished(spark: SparkSession, dir: String): DataFrame =
      readPublishedVersion(spark, dir, currentVersion(spark, dir))

    /** H24 SCHEMA EVOLUTION read: the current version with the UNION
      * schema across every listed file (Parquet footer merge), so a
      * table whose appends grew columns over time reads as one frame
      * — old files' missing columns are null, exactly the
      * Delta/Iceberg evolution contract. Kept separate from
      * [[readPublished]] (footer-merge costs one extra driver pass
      * over file metadata and most tables never evolve): callers opt
      * in where drift is expected — landed CDC feeds, long-lived
      * catalogs — and the C50 schema-drift AUDIT decides what the
      * evolved read then absorbs. */
    def readPublishedEvolved(spark: SparkSession, dir: String): DataFrame = {
      val files = manifestFiles(spark, dir, currentVersion(spark, dir))
      spark.read.option("mergeSchema", "true").parquet(files: _*)
    }

    /** Time travel: any still-retained version. */
    def readPublishedVersion(spark: SparkSession, dir: String,
        version: Long): DataFrame = {
      require(version > 0, s"no published version under $dir")
      val files = manifestFiles(spark, dir, version)
      spark.read.parquet(files: _*)
    }

    def latestVersion(spark: SparkSession, dir: String): Long =
      currentVersion(spark, dir)

    /** Retention pass: drop manifests older than the newest
      * `keepVersions` and DELETE every data file no surviving manifest
      * references — the vacuum that bounds storage under snapshot
      * publishes (each replaces the logical content but leaves old
      * files readable until vacuumed). Orphans from dead writers are
      * collected too: anything under `data/` that no surviving
      * manifest names. Deletion order is safe under the single-writer
      * contract: manifests are pruned FIRST, so a crash mid-vacuum
      * leaves at worst still-referenced files intact and some garbage
      * for the next pass — never a referenced file missing. */
    def vacuum(spark: SparkSession, dir: String,
        keepVersions: Int = 1): Unit = {
      val f = fs(spark)
      val cur = currentVersion(spark, dir)
      if (cur == 0L) return
      val keepFrom = math.max(1L, cur - keepVersions + 1)
      val all = f.listStatus(p(s"$dir/_manifests")).toSeq
        .map(_.getPath.getName)
        .filter(_.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      all.filter(_ < keepFrom).foreach { v =>
        f.delete(p(f"$dir/_manifests/v$v%08d.manifest"), false) }
      val live = (keepFrom to cur)
        .flatMap(v => manifestFiles(spark, dir, v))
        .map(_.stripPrefix(s"$dir/")).toSet
      // every parquet under data/ not named by a surviving manifest
      val it = f.listFiles(p(s"$dir/data"), true)
      val doomed = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toString.split("/data/", 2) match {
          case Array(_, r) => s"data/$r"; case _ => ""
        }
        if (st.isFile && rel.endsWith(".parquet") && !live.contains(rel))
          doomed += rel
      }
      doomed.foreach(rel => f.delete(p(s"$dir/$rel"), false))
    }

    // ---- H19: per-file min/max stats + data skipping ---------------

    /** H19 publish with PER-FILE MIN/MAX column statistics — the
      * Delta/Iceberg data-skipping shape on this manifest format:
      * the frame is range-clustered on `statsCol` before the write
      * (skipping is only as good as the clustering — the H14 z-order
      * lesson in one dimension), then each fresh file's (min, max)
      * of `statsCol` is recorded in a `vNNN.stats` sidecar next to
      * the manifest. Stats are computed with ONE distributed pass
      * over the fresh files only (grouped by `input_file_name()` —
      * file-count-sized driver state); predecessor versions keep
      * their own sidecars, so stats accrete append-by-append like
      * the manifests themselves. `statsCol` must be integral
      * (BIGINT-comparable) — the cents/id/timestamp-µs columns a
      * range predicate actually hits. */
    def publishAppendStats(df: DataFrame, dir: String, statsCol: String,
        buckets: Int = 8): Long = {
      val spark = df.sparkSession
      import org.apache.spark.sql.functions._
      val v = publishAppend(
        df.repartitionByRange(buckets, df.col(statsCol)), dir)
      val sub = f"data/v$v%08d"
      val stats = spark.read.parquet(s"$dir/$sub")
        .groupBy(input_file_name().as("f"))
        .agg(min(col(statsCol).cast("long")).as("mn"),
          max(col(statsCol).cast("long")).as("mx"))
        .collect()
        .map { r =>
          val rel = r.getString(0).split("/data/", 2) match {
            case Array(_, rest) => s"data/$rest"
            case _ => r.getString(0)
          }
          s"$rel\t${r.getLong(1)}\t${r.getLong(2)}"
        }
      writeFile(spark, f"$dir/_manifests/v$v%08d.stats",
        stats.sorted.mkString("\n"))
      v
    }

    /** All recorded per-file stats visible from the CURRENT version:
      * rel path → (min, max). Files with no recorded stats are simply
      * absent (readers must keep them — skipping is an optimization,
      * never a filter). */
    private def fileStats(spark: SparkSession,
        dir: String): Map[String, (Long, Long)] = {
      val f = fs(spark)
      val sdir = p(s"$dir/_manifests")
      if (!f.exists(sdir)) return Map.empty
      f.listStatus(sdir).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".stats"))
        .flatMap { sp =>
          val in = f.open(sp)
          try scala.io.Source.fromInputStream(in).getLines()
            .filter(_.nonEmpty).map { l =>
              val Array(rel, mn, mx) = l.split("\t")
              rel -> ((mn.toLong, mx.toLong))
            }.toList
          finally in.close()
        }.toMap
    }

    /** The skipping decision, exposed for metrics/specs: of the
      * current manifest's files, which survive the [lo, hi] range
      * predicate on the stats column? Returns (kept, total). A file
      * without stats is kept unconditionally. */
    def pruneFiles(spark: SparkSession, dir: String, lo: Long,
        hi: Long): (Seq[String], Int) = {
      val all = manifestFiles(spark, dir, currentVersion(spark, dir))
      val stats = fileStats(spark, dir)
      val kept = all.filter { abs =>
        stats.get(abs.stripPrefix(s"$dir/")) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
      (kept, all.size)
    }

    /** H19 stats-pruned range read: list only the files whose
      * recorded [min, max] intersects [lo, hi], scan those, and apply
      * the exact predicate on top (stats prune FILES; the filter
      * still owns row-level truth — pruning can never change the
      * answer, only the bytes read). At 100 TB this is the difference
      * between listing a manifest and scanning a table: the skipping
      * decision costs file-count work on the driver, zero executor
      * time. */
    def readPrunedRange(spark: SparkSession, dir: String,
        statsCol: String, lo: Long, hi: Long): DataFrame = {
      import org.apache.spark.sql.functions._
      val (kept, _) = pruneFiles(spark, dir, lo, hi)
      require(kept.nonEmpty,
        s"no file under $dir intersects [$lo, $hi] — read the " +
          "published view and filter if an empty frame is acceptable")
      spark.read.parquet(kept: _*)
        .filter(col(statsCol).cast("long").between(lo, hi))
    }
  }

  /** Read a parquet dataset whose files were written across schema
    * GENERATIONS (columns added over time — the normal life of a
    * long-lived ingest directory): union the files' footer schemas
    * (`mergeSchema`) so old-generation files surface late-added
    * columns as nulls instead of the default single-footer read,
    * which silently drops columns whenever the sampled file happens
    * to be old-generation. Cost is a footer read per file —
    * distributed, and proportional to file COUNT, not data bytes, so
    * it stays cheap at 100 TB if the layout is compacted (Sink
    * .compact); predicate pushdown and partition pruning work
    * unchanged on the merged schema, including filters on late-added
    * columns (parquet readers treat a missing column as all-null and
    * row-group stats prune accordingly). */
  def parquetEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
