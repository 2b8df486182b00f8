package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Query surface + DuckDB oracles: binary media decode tiers (WAV/BMP/PNG/JPEG/MBMP) and their feature reads.
  *
  * Split from the SparkEntry monolith (r14 verdict: 22.9k lines,
  * +25% per round) — entries and their oracles move TOGETHER, are
  * aggregated into the driver contract by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]], and EntrySpec pins key parity across
  * the family objects. Shared fixtures/CTE builders stay on
  * [[SparkEntry]] (private[graft]).
  */
private[graft] object EntriesMultimodal {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal×Dedup: PERCEPTUAL image near-dup — every doc renders
    // to a real 8×7 BMP (every 5th doc also plants a copy with 3 low
    // bits of one red channel flipped), payloads decode through the
    // real parser inside mapPartitions (bytes never shuffle), each
    // image fingerprints to a 56-bit integer average-hash, and pairs
    // at hamming ≤ 2 surface via 4×14-bit banding — recall-COMPLETE
    // for ≤ 2 differing bits by pigeonhole (≥ 2 of 4 bands intact), so
    // the banded engine result equals the oracle's all-pairs truth.
    "q137_image_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.flatMap { case (id, text0) =>
        val tx = if (text0.isEmpty) "x" else text0
        def px(perturb: Boolean) = Array.tabulate(56) { i =>
          val cp = tx.charAt(i % tx.length).toInt
          val r0 = cp % 256
          val r = if (perturb && i == 0) r0 ^ 7 else r0
          (r << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        val base = (id, Multimodal.bmpBytes(8, 7, px(perturb = false)))
        if (id % 5 == 0)
          Seq(base, (id + 2000000000, Multimodal.bmpBytes(8, 7, px(perturb = true))))
        else Seq(base)
      }
      // the hash table feeds both sides of the banded self-join (q29)
      val hs = Multimodal.imageHashesBatched(media).persist()
      val bands = hs.select(col("id"), col("hash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("hash"), 14 * b).bitwiseAND(lit(0x3FFFL))): _*))
          .as(Seq("band", "bval")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.hamming(col("a.hash"), col("b.hash")).as("hamming"))
        .filter(col("hamming") <= 2)
        .distinct()
    }),
    // Multimodal: image PATCHIFY — 8×4 synthesized BMPs decode through
    // the real parser and split into a 2×2 grid of 4×2 tiles, one
    // exact integer brightness sum per tile (the patch-embedding prep
    // shape; tiles, never payloads, cross the shuffle).
    "q183_image_patches" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        // pad short texts with spaces so charAt never throws on a
        // sub-32-char document (the oracle rpads identically)
        val t32 = if (text.length >= 32) text else (text + " " * 32)
        val pixels = Array.tabulate(32) { i =>
          val cp = t32.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(8, 4, pixels))
      }
      Multimodal.patchBrightness(media, 4, 2)
    }),
    // Multimodal: SCENE-CUT detection — 8-frame MBMP videos with a
    // planted channel inversion from frame 4; SAD per transition
    // (modular brightness deltas cancel, absolute diffs don't),
    // threshold 2000 separates the within-scene +1 drift.
    "q431_scene_cuts" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val t0 = if (text.isEmpty) "x" else text
        val frames = (0 until 8).map { f =>
          val pixels = Array.tabulate(28) { i =>
            val cp = t0.charAt(i % t0.length).toInt
            val r = (cp + f) % 256
            val g = (cp * 7 + f) % 256
            val b = (cp * 13 + f) % 256
            val (rr, gg, bb) =
              if (f >= 4) (255 - r, 255 - g, 255 - b) else (r, g, b)
            (rr << 16) | (gg << 8) | bb
          }
          Multimodal.bmpBytes(7, 4, pixels)
        }
        (id, Multimodal.mbmpBytes(frames))
      }
      Multimodal.sceneCutsBatched(media, 2000L).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("is_cut"), col("frame"))).as("first_cut"))
    }),
    // Multimodal: REAL JPEG decode — the most common crawl image
    // format, through the same javax.imageio tier as q374's PNG. The
    // lossy-codec gate trick: fixtures are built INSIDE the lossless
    // subset (gray 8×8-uniform DCT blocks at explicit quality 1.0 —
    // chroma constant, DC-only luma, unit quant table — measured
    // byte-exact across all fixture shapes), so the oracle recomputes
    // decoded-pixel features from the construction arithmetic.
    // Dimensions + component count come from the marker WALK
    // (metadata without entropy-decode — the cheap 100 TB scan path),
    // checksum/first_byte from the real FormatDecoder decode; the
    // container byte length is an encoder detail and not projected.
    "q478_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      def media = docs.map { case (id, text) =>
        val bw = (1 + (id % 3)).toInt; val bh = (1 + (id % 2)).toInt
        val (w, h) = (8 * bw, 8 * bh)
        val grays = Array.tabulate(bw * bh)(b =>
          (text.charAt(b).toInt * 7 + b * 13) % 256)
        val px = Array.tabulate(w * h) { i =>
          val g = grays((i / w / 8) * bw + (i % w / 8))
          (g << 16) | (g << 8) | g
        }
        (id, Multimodal.jpegBytes(w, h, px))
      }
      val dims = media.map { case (id, b) =>
        val (w, h, nc) = Multimodal.jpegDims(b).getOrElse((-1, -1, -1))
        (id, w, h, nc)
      }.toDF("doc_id", "width", "height", "n_components")
      dims.join(Multimodal.decodeFeaturesBatched(media).toDF()
          .select(col("doc_id"), col("checksum"), col("first_byte")),
        "doc_id")
    }),
    // Multimodal: REAL (animated) GIF decode — the fifth format
    // tier. Each doc's text paints 1 + id%3 frames of 6×3 grays
    // written through an explicit 256-gray palette (palette-indexed
    // LZW is lossless BY CONSTRUCTION — no DCT subset needed); dims
    // + frame census come from the block-walk scan (no LZW decode,
    // the 100 TB triage pass that separates animations from
    // stills), checksum/first_byte from the real first-frame decode
    // through the FormatDecoder seam.
    "q488_gif_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      def media = docs.map { case (id, text) =>
        val nf = (1 + id % 3).toInt
        val frames = (0 until nf).map(f => Array.tabulate(18) { i =>
          val g = (text.charAt(i).toInt * 13 + f * 7 + i * 3) % 256
          (g << 16) | (g << 8) | g
        })
        (id, Multimodal.gifBytes(6, 3, frames))
      }
      val scan = media.map { case (id, b) =>
        val (w, h, _, nf) =
          Multimodal.gifScan(b).getOrElse((-1, -1, -1, -1))
        (id, w, h, nf)
      }.toDF("doc_id", "width", "height", "n_frames")
      scan.join(Multimodal.decodeFeaturesBatched(media).toDF()
          .select(col("doc_id"), col("checksum"), col("first_byte")),
        "doc_id")
    }),
    // Audio QA: CLIPPING detection — the q111 samples scaled ×16
    // saturate near full scale; exact per-clip counts and peak
    // through the real RIFF parse.
    "q472_wav_clipping" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 48)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096 - 2048) * 16)
            .toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.wavClippingBatched(media, 32700).toDF()
    }),
    // Multimodal: SILENCE-TRIM audit — WAV clips with id-derived
    // leading/trailing zero padding around the q111 sample formula;
    // the trim scan must find the first/last |sample| ≥ 64 through a
    // REAL RIFF parse.
    "q432_wav_trim" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val lead = (id % 20).toInt
        val trail = (id % 7).toInt
        val n = math.min(text.length, 48)
        val body = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(
          Array.fill(lead)(0.toShort) ++ body ++
            Array.fill(trail)(0.toShort)))
      }
      Multimodal.wavTrimSilenceBatched(media, 64).toDF()
    }),
    // Multimodal: REAL PNG decode through the javax.imageio tier —
    // each doc's text paints a 5×5 TYPE_INT_RGB image written as an
    // actual PNG (zlib-compressed scanlines, a codec the pure-JVM BMP
    // arithmetic never touches) and the default FormatDecoder sniffs
    // the 8-byte signature and truly INFLATES it back to pixels. The
    // oracle recomputes the features from the construction arithmetic
    // (the q113 convention); the container byte LENGTH is an encoder
    // detail and is deliberately NOT projected — pixel features only.
    "q374_png_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(25) { i =>
          val cp = text.charAt(i).toInt
          (((cp * 11) % 256) << 16) | (((cp * 5) % 256) << 8) |
            ((cp * 2) % 256)
        }
        (id, Multimodal.pngBytes(5, 5, pixels))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
        .select(col("doc_id"), col("checksum"), col("first_byte"))
    }),
    // Multimodal: the IMAGE sibling of q111 — each doc's text paints a
    // real 7×4 24-bit BMP (odd width, so every row carries 3 pad
    // bytes; written bottom-up as the format demands), and the default
    // FormatDecoder sniffs 'BM' and truly parses it: pixel features
    // only match the oracle if the parser un-flips rows, skips
    // padding, and reads BGR in order. Same no-shuffle payload
    // lifecycle as q111.
    "q113_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(28) { i =>
          val cp = text.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(7, 4, pixels))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
    }),
    // Multimodal: REAL format decode through the Decoder seam — each
    // doc's text synthesizes an actual RIFF/WAVE PCM16 payload
    // (samples are a fixed arithmetic function of the doc's code
    // points) executor-side, and the default FormatDecoder sniffs the
    // magic bytes and REALLY parses the container (chunk walk, fmt +
    // data, little-endian PCM16) — the oracle recomputes the decoded
    // sample features from the same construction arithmetic, so a
    // parse that misreads any header field or sample byte hash-fails.
    // Payloads are born and decoded inside one mapPartitions chain:
    // no shuffle ever carries the binary column.
    "q111_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
    }),
    // Multimodal: image RESIZE stage — q113's 7×4 BMP payloads run the
    // full decode → nearest-neighbor 3×2 downsample → re-encode →
    // re-decode round trip (two independent parses of two different
    // real BMP layouts: the 7-wide input rows carry 3 pad bytes, the
    // re-encoded 3-wide rows carry 3 again). Features come from the
    // RESIZED pixels, so the oracle's integer source-index map (x·7/3,
    // y·4/2) must match the engine's resampler exactly.
    "q115_bmp_resize" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(28) { i =>
          val cp = text.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(7, 4, pixels))
      }
      Multimodal.decodeFeaturesBatched(
        Multimodal.resizeImagesBatched(media, 3, 2)).toDF()
    }),
    // Multimodal: audio FRAME features — q111's WAV payloads decoded and
    // split into fixed 16-sample frames (trailing partial dropped), one
    // integer feature row per frame: zero-crossing count + Σ|sample|
    // energy. The frame-sample + feature-extract stages of an audio
    // training pipeline, fused with the decode in one mapPartitions —
    // only (doc, frame, int, long) rows ever leave the scan stage.
    "q116_wav_frames" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.wavFrameFeaturesBatched(media, 16).toDF()
    }),
    // Multimodal: Walsh–Hadamard SEQUENCY energy — q111's WAV payloads
    // decoded, framed (16 samples), and transformed against the ±1
    // square-wave bases entirely in integer arithmetic; per (doc, k)
    // one Σc_k² energy row. The spectral-feature stage of an audio
    // pipeline with none of FFT's cross-engine float drift; the oracle
    // recomputes every coefficient from the definition
    // c_k = Σ_j s_j·(−1)^popcount(k AND j).
    "q208_wht_energy" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.wavSequencyEnergyBatched(media, 16).toDF()
    }),
    // Multimodal: VIDEO frame-sampling — each doc's text paints a
    // 4-frame 7×4 "video" (an MBMP container: length-prefixed real BMP
    // frames, MJPEG's shape), and the sampler walks the container,
    // pixel-decodes ONLY every 2nd frame (frames 0 and 2 — un-sampled
    // frames are never parsed), and emits the decoded features per
    // sampled frame. Frame f's pixels derive from the text with an
    // f-offset, so a sampler that miscounts offsets, strides, or
    // decodes the wrong frame hash-fails.
    "q122_video_frames" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val frames = (0 until 4).map { f =>
          val pixels = Array.tabulate(28) { i =>
            val cp = text.charAt(i).toInt
            (((cp + f) % 256) << 16) | (((cp * 7 + f) % 256) << 8) |
              ((cp * 13 + f) % 256)
          }
          Multimodal.bmpBytes(7, 4, pixels)
        }
        (id, Multimodal.mbmpBytes(frames))
      }
      Multimodal.videoFrameSampleBatched(media, 2).toDF()
    }),
    // Multimodal: binary payload plumbing — metadata sniff + frame
    // sampling + per-frame stub feature, all without decoding.
    "q33_multimodal" -> ((s, dir) => {
      val blob = col("text").cast("binary")
      val frames = Multimodal.sampleFrames(blob, 64, 32)
      // per-row hex/frame extraction on a 1-task scan — spread first
      Multimodal.withBlobMetadata(
          t(s, dir, "documents").select(col("doc_id"), col("text"))
            .repartition(s.sessionState.conf.numShufflePartitions), blob)
        .withColumn("n_frames", size(frames))
        .withColumn("f0_checksum",
          when(size(frames) > 0,
            Multimodal.frameChecksum(element_at(frames, 1), 32)))
        .select("doc_id", "n_bytes", "header_hex", "n_frames", "f0_checksum")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // The aHash recomputed from the CONSTRUCTION arithmetic (q113's
    // convention — the oracle never parses BMP bytes): same integer
    // gray/mean/threshold chain, perturbed copy flips 3 red bits of
    // pixel 0; truth is the all-pairs hamming ≤ 2 scan, which the
    // engine's recall-complete 4-band blocking must equal exactly.
    "q137_image_phash_dedup" ->
      s"""WITH base AS (SELECT doc_id,
         |    CASE WHEN length(text) = 0 THEN 'x' ELSE text END AS t
         |  FROM documents),
         |cps AS (SELECT doc_id,
         |    list_transform(range(0, 56), i -> unicode(substr(t,
         |      CAST(i % length(t) AS INT) + 1, 1))) AS cp
         |  FROM base),
         |gs AS (
         |  SELECT doc_id,
         |    list_transform(cp, c ->
         |      ((c % 256) + ((c * 7) % 256) + ((c * 13) % 256)) // 3) AS g
         |  FROM cps
         |  UNION ALL
         |  SELECT doc_id + 2000000000 AS doc_id,
         |    [((xor(cp[1] % 256, 7)) + ((cp[1] * 7) % 256)
         |       + ((cp[1] * 13) % 256)) // 3] ||
         |      list_transform(cp[2:56], c ->
         |        ((c % 256) + ((c * 7) % 256) + ((c * 13) % 256)) // 3) AS g
         |  FROM cps WHERE doc_id % 5 = 0),
         |hs AS (SELECT doc_id,
         |    CAST(list_sum([CASE WHEN g[i + 1] > (list_sum(g) // 56)
         |        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
         |      for i in range(0, 56)]) AS BIGINT) AS h
         |  FROM gs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.h, b.h)) AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h, b.h)) <= 2""".stripMargin,
    // Recomputes each tile's brightness sum from the construction
    // arithmetic (the q113 convention — a decode that misreads any
    // header field, row flip, or padding byte hash-fails): per-pixel
    // brightness keyed by the top-down row-major index, grouped by
    // the ⌊r/2⌋, ⌊c/4⌋ tile.
    "q183_image_patches" ->
      """WITH px AS (SELECT doc_id, rpad(text, 32, ' ') AS text,
        |    CAST(unnest(range(0, 32)) AS INT) AS i FROM documents),
        |v AS (SELECT doc_id, i // 8 AS r, i % 8 AS c,
        |    (unicode(substr(text, CAST(i + 1 AS INT), 1)) % 256)
        |    + ((unicode(substr(text, CAST(i + 1 AS INT), 1)) * 7) % 256)
        |    + ((unicode(substr(text, CAST(i + 1 AS INT), 1)) * 13) % 256)
        |      AS br
        |  FROM px)
        |SELECT doc_id, CAST(r // 2 AS INT) AS tile_r,
        |  CAST(c // 4 AS INT) AS tile_c,
        |  CAST(sum(br) AS BIGINT) AS px_sum
        |FROM v GROUP BY 1, 2, 3""".stripMargin,
    // SAD per transition replayed from the construction arithmetic
    // (the q122 convention — the oracle never parses MBMP bytes);
    // the inversion boundary lands at frame 4.
    "q431_scene_cuts" -> {
      def ch(mult: Int, f: String): String =
        s"(CASE WHEN $f >= 4 THEN 255 - ((c * $mult + $f) % 256) " +
          s"ELSE (c * $mult + $f) % 256 END)"
      def term(mult: Int): String =
        s"abs(${ch(mult, "f.f")} - ${ch(mult, "f.f - 1")})"
      s"""WITH base AS (SELECT doc_id,
         |    CASE WHEN length(text) = 0 THEN 'x' ELSE text END AS t
         |  FROM documents),
         |cps AS (SELECT doc_id,
         |    list_transform(range(0, 28), i -> unicode(substr(t,
         |      CAST(i % length(t) AS INT) + 1, 1))) AS cp
         |  FROM base),
         |tr AS (SELECT doc_id, f.f,
         |    CAST(list_sum(list_transform(cp, c ->
         |      ${term(1)} + ${term(7)} + ${term(13)})) AS BIGINT)
         |      AS sad
         |  FROM cps
         |  CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7]) AS f) f)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
         |  CAST(count(*) FILTER (WHERE sad > 2000) AS BIGINT)
         |    AS n_cuts,
         |  CAST(min(CASE WHEN sad > 2000 THEN f END) AS INT)
         |    AS first_cut
         |FROM tr GROUP BY 1""".stripMargin
    },
    // Decoded-JPEG features recomputed from the construction: the
    // fixture lives in the codec's lossless subset (gray 8×8 blocks,
    // quality 1.0), so each block decodes to exactly 64·3·gray
    // channel mass; a decode (or marker walk) that misreads any
    // block, dimension, or channel hash-fails.
    "q478_jpeg_decode" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(1 + doc_id % 3 AS BIGINT) AS bw,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS bh FROM documents),
        |g AS (SELECT s.doc_id, s.bw, s.bh,
        |    [ (unicode(substr(d.text, CAST(b + 1 AS INT), 1)) * 7
        |       + b * 13) % 256
        |      for b in range(0, CAST(s.bw * s.bh AS INT)) ] AS grays
        |  FROM s JOIN documents d ON d.doc_id = s.doc_id)
        |SELECT doc_id, CAST(8 * bw AS INT) AS width,
        |  CAST(8 * bh AS INT) AS height, CAST(3 AS INT) AS n_components,
        |  CAST(192 * list_sum(grays) AS BIGINT) AS checksum,
        |  CAST(grays[1] AS INT) AS first_byte
        |FROM g""".stripMargin,
    // Palette-indexed LZW is lossless, so the oracle recomputes
    // first-frame pixel features straight from the construction
    // arithmetic; the frame census must equal the construction's
    // 1 + id%3 (a scan that missed an image descriptor, or counted
    // an extension block as one, hash-fails).
    "q488_gif_decode" ->
      """WITH g AS (SELECT doc_id,
        |    [ (unicode(substr(text, CAST(i + 1 AS INT), 1)) * 13
        |       + i * 3) % 256
        |      for i in range(0, 18) ] AS grays FROM documents)
        |SELECT doc_id, CAST(6 AS INT) AS width,
        |  CAST(3 AS INT) AS height,
        |  CAST(1 + doc_id % 3 AS INT) AS n_frames,
        |  CAST(3 * list_sum(grays) AS BIGINT) AS checksum,
        |  CAST(grays[1] AS INT) AS first_byte
        |FROM g""".stripMargin,
    // The scaled q111 samples replayed as a list; counts and peak
    // by comprehension.
    "q472_wav_clipping" ->
      """WITH smp AS (SELECT doc_id,
        |    [CAST(((unicode(substr(text, CAST(i AS INT) + 1, 1))
        |        * 37 + i) % 4096 - 2048) * 16 AS BIGINT)
        |      for i in range(0, least(length(text), 48))] AS s
        |  FROM documents)
        |SELECT doc_id, CAST(len(s) AS INT) AS n_samples,
        |  CAST(len([x for x in s if abs(x) >= 32700]) AS INT)
        |    AS n_clipped,
        |  CAST(coalesce(list_max(list_transform(s, x -> abs(x))), 0)
        |    AS INT) AS max_abs,
        |  CAST(CASE WHEN len(s) = 0 THEN 0
        |    ELSE (len([x for x in s if abs(x) >= 32700]) * 1000000)
        |      // len(s) END AS BIGINT) AS clip_micro
        |FROM smp""".stripMargin,
    // The zero-padded q111 sample formula replayed as a list; the
    // trim indices come from the qualifying-position comprehension.
    "q432_wav_trim" ->
      """WITH smp AS (SELECT doc_id,
        |    [CAST(0 AS BIGINT)
        |      for i in range(0, CAST(doc_id % 20 AS INT))] ||
        |    [CAST(((unicode(substr(text, CAST(i AS INT) + 1, 1)) * 37
        |        + i) % 4096) - 2048 AS BIGINT)
        |      for i in range(0, least(length(text), 48))] ||
        |    [CAST(0 AS BIGINT)
        |      for i in range(0, CAST(doc_id % 7 AS INT))] AS s
        |  FROM documents),
        |q AS (SELECT doc_id, len(s) AS n,
        |    [i for i in range(1, len(s) + 1) if abs(s[i]) >= 64]
        |      AS hit
        |  FROM smp)
        |SELECT doc_id, CAST(n AS INT) AS n_samples,
        |  CAST(CASE WHEN len(hit) = 0 THEN n ELSE hit[1] - 1 END
        |    AS INT) AS lead_silence,
        |  CAST(CASE WHEN len(hit) = 0 THEN 0
        |    ELSE n - hit[len(hit)] END AS INT) AS trail_silence,
        |  CAST(CASE WHEN len(hit) = 0 THEN 0
        |    ELSE hit[len(hit)] - hit[1] + 1 END AS INT)
        |    AS trimmed_len
        |FROM q""".stripMargin,
    // The decoded-pixel features recomputed from the construction
    // arithmetic — a decode that misreads any scanline, filter byte,
    // or channel order hash-fails; n_bytes is an encoder detail and
    // not compared.
    "q374_png_decode" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 26), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 11) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 5) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 2) % 256))
        |      AS ch,
        |    (unicode(substr(text, 1, 1)) * 11) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(list_sum(ch) AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,
    // Recomputes the decoded PIXEL features from the construction
    // arithmetic: n_bytes = 54-byte headers + 4 rows × (21 + 3 pad);
    // checksum = Σ (r+g+b) over the 28 pixels; first_byte = top-left
    // red channel. The engine must round-trip through real padded
    // bottom-up BMP bytes to match.
    "q113_bmp_decode" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 29), i ->
        |      (unicode(substr(text, CAST(i AS INT), 1)) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 7) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 13) % 256)) AS ch,
        |    unicode(substr(text, 1, 1)) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(54 + 4 * 24 AS INT) AS n_bytes,
        |  CAST(list_sum(ch) AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,
    // Recomputes the DECODED features from the payload-construction
    // arithmetic: n_bytes = 44-byte canonical WAV header + 2 bytes per
    // PCM16 sample; checksum = sum of the signed sample values;
    // first_byte = the first sample. The engine must round-trip the
    // same numbers through real RIFF bytes to match.
    "q111_wav_decode" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d)
        |SELECT doc_id, CAST(44 + 2 * n AS INT) AS n_bytes,
        |  CAST(coalesce(list_sum(smp), 0) AS BIGINT) AS checksum,
        |  CAST(coalesce(smp[1], -1) AS INT) AS first_byte
        |FROM s""".stripMargin,
    // Recomputes the RESIZED pixel features from the construction
    // arithmetic plus the nearest-neighbor index map: output (x,y) of
    // the 3×2 target reads source (x·7/3, y·4/2) — flat 1-based index
    // 14·(y·4/2 ≠ 0) + x·7/3 + 1 → {1,3,5,15,17,19}; n_bytes is the
    // re-encoded 3×2 BMP (54 + 2 rows × (9 + 3 pad) = 78); first_byte
    // the resized top-left red channel (= source pixel 1's red).
    "q115_bmp_resize" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 29), i ->
        |      (unicode(substr(text, CAST(i AS INT), 1)) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 7) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 13) % 256)) AS ch,
        |    unicode(substr(text, 1, 1)) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(78 AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(range(0, 6), i ->
        |    ch[CAST((i // 3) * 2 * 7 + ((i % 3) * 7) // 3 + 1 AS INT)]))
        |    AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,
    // Recomputes the per-FRAME features from the sample-construction
    // arithmetic: samples s_i = ((cp_{i+1}·37 + i) % 4096) − 2048 split
    // into 16-sample frames (partial tail dropped); zero_cross counts
    // sign flips between consecutive samples inside the frame (zero is
    // non-negative), energy = Σ|s| — all integer-exact on both engines.
    "q116_wav_frames" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d),
        |f AS (SELECT doc_id, CAST(unnest(range(0, n // 16)) AS INT)
        |    AS frame, smp FROM s)
        |SELECT doc_id, frame,
        |  CAST(len([i for i in range(2, 17)
        |    IF (smp[frame * 16 + i - 1] < 0) != (smp[frame * 16 + i] < 0)])
        |    AS INT) AS zero_cross,
        |  CAST(list_sum(list_transform(smp[frame * 16 + 1 : frame * 16 + 16],
        |    x -> abs(x))) AS BIGINT) AS energy
        |FROM f""".stripMargin,
    // Recomputes every WHT coefficient from the definition (popcount
    // parity sign over the k AND j grid) on the same synthesized
    // sample lists, squares and sums across frames — the engine's
    // butterfly must land on identical integers.
    "q208_wht_energy" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d),
        |f AS (SELECT doc_id, CAST(unnest(range(0, n // 16)) AS INT)
        |    AS frame, smp FROM s),
        |ks AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS k),
        |c AS (SELECT doc_id, frame, k,
        |    CAST(list_sum(list_transform(range(0, 16), j ->
        |      smp[frame * 16 + CAST(j AS INT) + 1]
        |        * (1 - 2 * (bit_count(CAST(k AS BIGINT)
        |            & CAST(j AS BIGINT)) % 2)))) AS BIGINT) AS coef
        |  FROM f CROSS JOIN ks)
        |SELECT doc_id, k, CAST(sum(coef * coef) AS BIGINT) AS energy
        |FROM c GROUP BY 1, 2""".stripMargin,
    // Recomputes the SAMPLED frames' decoded features from the
    // construction arithmetic: frames {0, 2} of 4 at stride 2; frame
    // f's checksum = Σ_i ((cp+f)%256 + (cp·7+f)%256 + (cp·13+f)%256),
    // first_byte = (cp_1+f)%256 — per (doc, frame) row.
    "q122_video_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(unnest([0, 2]) AS INT) AS frame FROM documents)
        |SELECT doc_id, frame,
        |  CAST(list_sum(list_transform(range(1, 29), i ->
        |    ((unicode(substr(text, CAST(i AS INT), 1)) + frame) % 256)
        |    + ((unicode(substr(text, CAST(i AS INT), 1)) * 7 + frame) % 256)
        |    + ((unicode(substr(text, CAST(i AS INT), 1)) * 13 + frame) % 256)))
        |    AS BIGINT) AS checksum,
        |  CAST((unicode(substr(text, 1, 1)) + frame) % 256 AS INT)
        |    AS first_byte
        |FROM f""".stripMargin,
    "q33_multimodal" ->
      """SELECT doc_id, octet_length(blob) AS n_bytes,
        |  substr(hex(blob), 1, 16) AS header_hex,
        |  CASE WHEN octet_length(blob) < 32 THEN 0
        |    ELSE CAST(floor((octet_length(blob) - 32) / 64.0) + 1 AS INT) END AS n_frames,
        |  CASE WHEN octet_length(blob) >= 32 THEN
        |    CAST(list_sum([CAST('0x' || substr(hex(blob), (j-1)*2 + 1, 2) AS BIGINT)
        |      for j in range(1, 33)]) AS BIGINT) END AS f0_checksum
        |FROM (SELECT doc_id, CAST(text AS BLOB) AS blob FROM documents)""".stripMargin
  )
}
