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
    // usage: MemBw [random [mb <MiB-per-thread>]] <threads>...
    boolean random = args.length > 0 && args[0].equals("random");
    int mb = 1024;
    int i = random ? 1 : 0;
    if (random && args.length > i + 1 && args[i].equals("mb")) {
      mb = Integer.parseInt(args[i + 1]);
      i += 2;
    }
    boolean cpu = args.length > 0 && args[0].equals("cpu");
    if (cpu) i = 1;
    for (; i < args.length; i++) {
      if (cpu) runCpu(Integer.parseInt(args[i]));
      else if (random) runRandom(Integer.parseInt(args[i]), mb);
      else run(Integer.parseInt(args[i]));
    }
  }

  // Pure-ALU (cache-resident) variant: measures per-thread CPU throughput
  // scaling with active-core count — isolates turbo-frequency scaling from
  // memory effects. On shared/virtualized hosts, 2 busy cores clock higher
  // than 8; a real cluster node never sees that idle-box turbo because
  // every node carries the same per-node load.
  static void runCpu(int threads) throws Exception {
    long[] sink = new long[threads];
    Thread[] ts = new Thread[threads];
    final long iters = 2_000_000_000L;
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) {
      final int id = i;
      ts[i] = new Thread(() -> {
        long x = 88172645463325252L + id;
        for (long j = 0; j < iters; j++) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
        }
        sink[id] = x;
      });
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double sec = (System.nanoTime() - t0) / 1e9;
    System.out.printf("cpu threads=%d  %.2f Gops/s aggregate (%.2f Gops/s per thread, %.2f s, sink=%d)%n",
        threads, threads * iters / 1e9 / sec, iters / 1e9 / sec, sec, sink[0]);
  }

  // Random-access (latency-bound) variant: each thread pointer-chases a
  // private 1 GiB permutation cycle — the access pattern of hash-join
  // probes and object-graph deserialization, which L3 sharing hurts in a
  // way the streaming test can't see.
  static void runRandom(int threads, int mbPerThread) throws Exception {
    final int words = (mbPerThread << 20) / 8;
    long[][] bufs = new long[threads][];
    for (int i = 0; i < threads; i++) {
      long[] b = new long[words];
      // Sattolo's algorithm: one full-length cycle, deterministic seed
      java.util.Random r = new java.util.Random(42 + i);
      for (int j = 0; j < words; j++) b[j] = j;
      for (int j = words - 1; j > 0; j--) {
        int k = r.nextInt(j);
        long tmp = b[j]; b[j] = b[k]; b[k] = tmp;
      }
      bufs[i] = b;
    }
    long[] sink = new long[threads];
    Thread[] ts = new Thread[threads];
    final int hops = 32 << 20; // 32M dependent loads per thread
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) {
      final int id = i;
      ts[i] = new Thread(() -> {
        long p = 0;
        for (int j = 0; j < hops; j++) p = bufs[id][(int) p];
        sink[id] = p;
      });
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double sec = (System.nanoTime() - t0) / 1e9;
    double mops = (double) threads * hops / 1e6;
    System.out.printf("random threads=%d ws=%dMiB/thread  %.0f M dependent loads in %.2f s -> %.1f Mops/s aggregate (%.1f ns/load, sink=%d)%n",
        threads, mbPerThread, mops, sec, mops / sec, sec * 1e9 / ((double) hops), sink[0]);
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
