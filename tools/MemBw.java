// Memory-bandwidth scaling probe: N threads each stream-sum a private
// 1 GiB long[] (well past the 260 MiB shared L3), so aggregate throughput
// measures the box's DRAM bandwidth available to N cores. Used to put a
// physical ceiling under the Bench scaling legs: a single box shares one
// memory controller across legs, where a real 4N-core cluster brings 4N/8
// sockets' worth of bandwidth.
//
//   javac tools/MemBw.java -d /tmp && java -cp /tmp MemBw 2 8
public class MemBw {
  static final int WORDS = 128 << 20; // 1 GiB of longs per thread

  public static void main(String[] args) throws Exception {
    for (String a : args) run(Integer.parseInt(a));
  }

  static void run(int threads) throws Exception {
    long[][] bufs = new long[threads][];
    for (int i = 0; i < threads; i++) {
      bufs[i] = new long[WORDS];
      java.util.Arrays.fill(bufs[i], i + 1); // touch pages
    }
    long[] sink = new long[threads];
    Thread[] ts = new Thread[threads];
    final int passes = 8;
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) {
      final int id = i;
      ts[i] = new Thread(() -> {
        long s = 0;
        for (int p = 0; p < passes; p++)
          for (int j = 0; j < WORDS; j++) s += bufs[id][j];
        sink[id] = s;
      });
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double sec = (System.nanoTime() - t0) / 1e9;
    double gb = (double) threads * passes * WORDS * 8 / 1e9;
    System.out.printf("threads=%d  %.1f GB in %.2f s  -> %.1f GB/s aggregate (%.1f GB/s per thread, sink=%d)%n",
        threads, gb, sec, gb / sec, gb / sec / threads, sink[0]);
  }
}
