package graft.parse

import graft.parse.Proto.{Reader, Writer}

/** OTLP **profiles** signal (v1development) — the event class the
  * reference handles through `lib/cprofiles`
  * (cprof_decode_opentelemetry.c / cprof_encode_opentelemetry.c,
  * ingested by in_opentelemetry behind `profiles_support`,
  * opentelemetry.c:175). Clean-room wire codec against the public
  * field layout (field ids read from the vendored descriptor,
  * lib/fluent-otel-proto/.../profiles.pb-c.c):
  *
  *   ExportProfilesServiceRequest: resource_profiles=1, dictionary=2
  *   ProfilesDictionary: mapping_table=1, location_table=2,
  *     function_table=3, link_table=4, string_table=5,
  *     attribute_table=6, stack_table=7
  *   ResourceProfiles: resource=1, scope_profiles=2
  *   ScopeProfiles: scope=1, profiles=2
  *   Profile: sample_type=1, samples=2, time_unix_nano=3,
  *     duration_nano=4, period_type=5, period=6, profile_id=7
  *   Sample: stack_index=1, attribute_indices=2, link_index=3,
  *     values=4 (packed), timestamps_unix_nano=5 (packed)
  *   Stack: location_indices=1 (packed)
  *   Location: mapping_index=1, address=2, lines=3
  *   Line: function_index=1, line=2, column=3
  *   Function: name_strindex=1, system_name_strindex=2,
  *     filename_strindex=3, start_line=4
  *   ValueType: type_strindex=1, unit_strindex=2
  *
  * The flattened row is one SAMPLE with its resolved frame names
  * (leaf → root; a location's frame name is its first Line's function,
  * the pprof convention for the non-inlined case) — the input for
  * flame-graph self/total rollups.
  */
object ProfilesProto {

  final case class FlatSample(profileId: String, timeUnixNano: Long,
                              sampleType: String, unit: String,
                              period: Long, frames: Seq[String],
                              value: Long)

  // ------------------------------------------------------------- encoder

  /** Encode one profile: `samples` = (frames leaf→root, value). The
    * dictionary follows pprof reservation conventions — index 0 of
    * every table is the empty/default entry (cprofiles keeps the same
    * layout).
    */
  def encodeProfile(profileId: Array[Byte], timeUnixNano: Long,
                    sampleType: String, unit: String, period: Long,
                    samples: Iterator[(Seq[String], Long)]): Array[Byte] = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def strIdx(s: String): Int =
      strings.getOrElseUpdate(s, strings.size)
    val functions = scala.collection.mutable.LinkedHashMap[Int, Int](0 -> 0)
    def fnIdx(name: String): Int = {
      val si = strIdx(name)
      functions.getOrElseUpdate(si, functions.size)
    }
    val stacks = scala.collection.mutable.LinkedHashMap[Seq[Int], Int](
      Seq.empty -> 0)
    def stackIdx(frames: Seq[String]): Int = {
      // one location per frame; location i = function i (1:1 here)
      val locs = frames.map(fnIdx)
      stacks.getOrElseUpdate(locs, stacks.size)
    }

    val sampleMsgs = scala.collection.mutable.ArrayBuffer[Writer]()
    samples.foreach { case (frames, value) =>
      val w = new Writer
      w.int64(1, stackIdx(frames).toLong)
      // packed values (field 4)
      val pv = new Writer
      pv.varint(value)
      w.msg(4, pv)
      sampleMsgs += w
    }

    // register the period/sample-type strings BEFORE the string table
    // is serialized below — indices handed to ValueType must point into
    // the emitted table
    val sampleTypeI = strIdx(sampleType)
    val unitI = strIdx(unit)

    val dict = new Writer
    // location_table (field 2): one location per function, lines[0]
    // pointing at it — emitted in function index order so
    // location_index == function_index
    functions.foreach { case (strI, fi) =>
      val loc = new Writer
      if (fi != 0) {
        val line = new Writer
        line.int64(1, fi.toLong)
        loc.msg(3, line)
      }
      val _ = strI
      dict.msg(2, loc)
    }
    // function_table (field 3)
    functions.foreach { case (strI, _) =>
      val fn = new Writer
      if (strI != 0) fn.int64(1, strI.toLong)
      dict.msg(3, fn)
    }
    // string_table (field 5)
    strings.keysIterator.foreach(s => dict.str(5, s))
    // stack_table (field 7): packed location_indices
    stacks.keysIterator.foreach { locs =>
      val st = new Writer
      if (locs.nonEmpty) {
        val p = new Writer
        locs.foreach(i => p.varint(i.toLong))
        st.msg(1, p)
      }
      dict.msg(7, st)
    }

    val vt = new Writer
    vt.int64(1, sampleTypeI.toLong)
    vt.int64(2, unitI.toLong)

    val profile = new Writer
    profile.msg(1, vt)
    sampleMsgs.foreach(profile.msg(2, _))
    profile.int64(3, timeUnixNano)
    profile.int64(6, period)
    profile.bytes(7, profileId)

    val scopeProfiles = new Writer
    scopeProfiles.msg(2, profile)
    val resourceProfiles = new Writer
    resourceProfiles.msg(2, scopeProfiles)
    val req = new Writer
    req.msg(1, resourceProfiles)
    req.msg(2, dict)
    req.result()
  }

  // ------------------------------------------------------------- decoder

  private final case class Dict(strings: IndexedSeq[String],
                                fnNameStr: IndexedSeq[Int],
                                locFnIdx: IndexedSeq[Int],
                                stacks: IndexedSeq[Seq[Int]])

  private def packedLongs(r: Reader, wire: Int): Seq[Long] =
    if (wire == 2) {
      val s = r.lenSlice()
      val out = Seq.newBuilder[Long]
      while (s.hasMore) out += s.varint()
      out.result()
    } else Seq(r.varint())

  private def readDict(r: Reader): Dict = {
    val strings = IndexedSeq.newBuilder[String]
    val fnName = IndexedSeq.newBuilder[Int]
    val locFn = IndexedSeq.newBuilder[Int]
    val stacks = IndexedSeq.newBuilder[Seq[Int]]
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 2 => // location: first line's function index
          val s = r.lenSlice()
          var fi = 0
          while (s.hasMore) {
            val t2 = s.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (3, 2) =>
                val line = s.lenSlice()
                var lfi = 0
                while (line.hasMore) {
                  val t3 = line.varint()
                  ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                    case (1, 0) => lfi = line.varint().toInt
                    case (_, w) => line.skip(w)
                  }
                }
                if (fi == 0) fi = lfi
              case (_, w) => s.skip(w)
            }
          }
          locFn += fi
        case 3 => // function
          val s = r.lenSlice()
          var nameI = 0
          while (s.hasMore) {
            val t2 = s.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, 0) => nameI = s.varint().toInt
              case (_, w) => s.skip(w)
            }
          }
          fnName += nameI
        case 5 => strings += r.strField()
        case 7 => // stack: packed location indices
          val s = r.lenSlice()
          var locs: Seq[Long] = Seq.empty
          while (s.hasMore) {
            val t2 = s.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, w) => locs = locs ++ packedLongs(s, w)
              case (_, w) => s.skip(w)
            }
          }
          stacks += locs.map(_.toInt)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Dict(strings.result(), fnName.result(), locFn.result(), stacks.result())
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  /** Decode one ExportProfilesServiceRequest body into flattened sample
    * rows. Bounds-checked throughout (the body arrives on a listening
    * HTTP source); unknown fields skip by wire type.
    */
  def decode(body: Array[Byte]): Seq[FlatSample] = {
    val top = new Reader(body)
    val profiles = scala.collection.mutable.ArrayBuffer[Reader]()
    var dict = Dict(IndexedSeq(""), IndexedSeq(0), IndexedSeq(0),
      IndexedSeq(Seq.empty))
    while (top.hasMore) {
      val tag = top.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // resource_profiles
          val rp = top.lenSlice()
          while (rp.hasMore) {
            val t2 = rp.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (2, 2) => // scope_profiles
                val sp = rp.lenSlice()
                while (sp.hasMore) {
                  val t3 = sp.varint()
                  ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                    case (2, 2) => profiles += sp.lenSlice()
                    case (_, w) => sp.skip(w)
                  }
                }
              case (_, w) => rp.skip(w)
            }
          }
        case (2, 2) => dict = readDict(top.lenSlice())
        case (_, w) => top.skip(w)
      }
    }
    def strAt(i: Int): String =
      if (i >= 0 && i < dict.strings.length) dict.strings(i) else ""
    profiles.flatMap { p =>
      var sampleType = ""
      var unit = ""
      var timeNs = 0L
      var period = 0L
      var pid = ""
      val sampleSlices = scala.collection.mutable.ArrayBuffer[Reader]()
      while (p.hasMore) {
        val tag = p.varint()
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => // sample_type ValueType
            val vt = p.lenSlice()
            while (vt.hasMore) {
              val t2 = vt.varint()
              ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                case (1, 0) => sampleType = strAt(vt.varint().toInt)
                case (2, 0) => unit = strAt(vt.varint().toInt)
                case (_, w) => vt.skip(w)
              }
            }
          case (2, 2) => sampleSlices += p.lenSlice()
          case (3, 0) => timeNs = p.varint()
          case (6, 0) => period = p.varint()
          case (7, 2) => pid = hex(p.bytesField())
          case (_, w) => p.skip(w)
        }
      }
      sampleSlices.map { s =>
        var stackI = 0
        var values: Seq[Long] = Seq.empty
        while (s.hasMore) {
          val tag = s.varint()
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 0) => stackI = s.varint().toInt
            case (4, w) => values = values ++ packedLongs(s, w)
            case (_, w) => s.skip(w)
          }
        }
        val frames =
          if (stackI >= 0 && stackI < dict.stacks.length)
            dict.stacks(stackI).map { li =>
              val fi = if (li >= 0 && li < dict.locFnIdx.length)
                dict.locFnIdx(li) else 0
              val si = if (fi >= 0 && fi < dict.fnNameStr.length)
                dict.fnNameStr(fi) else 0
              strAt(si)
            }
          else Seq.empty
        FlatSample(pid, timeNs, sampleType, unit, period, frames,
          values.headOption.getOrElse(0L))
      }
    }.toSeq
  }
}
