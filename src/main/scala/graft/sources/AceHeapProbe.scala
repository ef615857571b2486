package graft.sources

/** Forked-JVM probe backing AceSourceSpec's heap-bound test: reads an
  * `.ace` file through the splittable DSv2 partition readers DIRECTLY
  * (no SparkSession) under a tiny `-Xmx`, proving the reader streams
  * paragraphs with a bounded buffer instead of materializing the file —
  * a whole-file read of the synthetic fixture would need ≥3× the heap
  * this JVM is given (byte array + decoded chars + the split copies).
  *
  * args: `<file> <splitSizeBytes>`; prints `ROWS=<n>` — the spec checks
  * the count matches the paragraph×datom arithmetic of the generator.
  */
object AceHeapProbe {
  def main(args: Array[String]): Unit = {
    val (file, splitSize) = (args(0), args(1).toLong)
    val conf = new org.apache.hadoop.conf.Configuration()
    val len = new java.io.File(file).length
    var n = 0L
    var start = 0L
    while (start < len) {
      val l = math.min(splitSize, len - start)
      val r = new AcePartitionReader(
        AceSplitPartition("file:" + file, start, l),
        Array.empty, Array("cls"), conf)
      while (r.next()) n += 1
      r.close()
      start += l
    }
    println(s"ROWS=$n")
  }
}
