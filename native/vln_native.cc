// vln_native: C++ runtime components for vln_imagine_tpu.
//
// 1. Graph world + all-pairs shortest paths (Floyd-Warshall with next-hop),
//    the build-time heavy step of the world compiler (replaces networkx
//    Dijkstra, VLN-HAMT/finetune_src/r2r/env.py:170-186).
// 2. A graph-mode simulator with the MatterSim behavioural surface the
//    reference actually uses (rendering disabled, discretized 30-degree
//    viewing angles: newEpisode / makeAction / getState / navigableLocations
//    / closest-view candidates; env.py:50-93, 221-291).  Serves as the
//    native parity oracle for the compiled array environment.
// 3. An mmap'd feature bank with batched row gather — the production
//    feature-IO path replacing per-key HDF5 reads (r2r/data_utils.py:15-47).
// 4. An async batch prefetcher over a bank: a worker thread gathers the
//    next batch's rows while the caller consumes the current one — the host
//    half of the reference's PrefetchLoader overlap
//    (pretrain_src/data/loader.py:90-124).
//
// Exposed through a minimal C ABI consumed via ctypes
// (vln_imagine_tpu/native.py).  Geometry conventions match
// envx/compiler.py: heading = atan2(dx, dy) (MatterSim's transposed axes),
// elevation = asin(dz / dist).

#include <algorithm>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kInf = 1.0e9;

double WrapPi(double a) {
  while (a > kPi) a -= 2 * kPi;
  while (a < -kPi) a += 2 * kPi;
  return a;
}

struct World {
  int n = 0;
  std::vector<double> xyz;                 // [n, 3]
  std::vector<std::vector<int>> neigh;     // sorted adjacency
  std::vector<double> dist;                // [n, n]
  std::vector<int> next;                   // [n, n]
  std::vector<int> hops;                   // [n, n]

  double* D(int i) { return &dist[static_cast<size_t>(i) * n]; }

  void HeadingElevation(int src, int dst, double* h, double* e) const {
    const double* a = &xyz[3 * src];
    const double* b = &xyz[3 * dst];
    double dx = b[0] - a[0], dy = b[1] - a[1], dz = b[2] - a[2];
    double d3 = std::max(std::sqrt(dx * dx + dy * dy + dz * dz), 1e-8);
    *h = std::atan2(dx, dy);
    *e = std::asin(std::min(1.0, std::max(-1.0, dz / d3)));
  }
};

struct Sim {
  World* world = nullptr;
  int views = 36;
  int node = 0;
  double heading = 0.0;
  double elevation = 0.0;
  int view_index = 0;

  int PerRow() const { return views / 3; }

  int ViewIndexOf(double h, double e) const {
    int per = PerRow();
    int col = static_cast<int>(std::lround(h / (2 * kPi / per))) % per;
    if (col < 0) col += per;
    int row = static_cast<int>(std::lround(e / (kPi / 6.0))) + 1;
    row = std::min(std::max(row, 0), 2);
    return row * per + col;
  }

  void Snap(double h, double e) {
    view_index = ViewIndexOf(h, e);
    int per = PerRow();
    heading = (view_index % per) * (2 * kPi / per);
    elevation = (view_index / per - 1) * (kPi / 6.0);
  }
};

int ClosestView(double heading, double elevation, int views) {
  int per = views / 3;
  double step = 2 * kPi / per;
  int col = static_cast<int>(std::lround(heading / step)) % per;
  if (col < 0) col += per;
  double rows[3] = {-kPi / 6.0, 0.0, kPi / 6.0};
  int best_row = 0;
  double best = 1e18;
  for (int r = 0; r < 3; ++r) {
    double d = std::fabs(rows[r] - elevation);
    if (d < best) {
      best = d;
      best_row = r;
    }
  }
  return best_row * per + col;
}

struct Bank {
  int fd = -1;
  size_t bytes = 0;
  const float* data = nullptr;
  int64_t rows = 0;
  int row_floats = 0;
};

}  // namespace

extern "C" {

// ------------------------------------------------------------- world
void* vln_world_create(int n_nodes, const double* xyz, int n_edges,
                       const int* edges) {
  World* w = new World();
  w->n = n_nodes;
  w->xyz.assign(xyz, xyz + 3 * static_cast<size_t>(n_nodes));
  w->neigh.assign(n_nodes, {});
  size_t nn = static_cast<size_t>(n_nodes) * n_nodes;
  w->dist.assign(nn, kInf);
  w->next.assign(nn, -1);
  w->hops.assign(nn, 1 << 28);
  for (int i = 0; i < n_nodes; ++i) {
    w->dist[static_cast<size_t>(i) * n_nodes + i] = 0.0;
    w->next[static_cast<size_t>(i) * n_nodes + i] = i;
    w->hops[static_cast<size_t>(i) * n_nodes + i] = 0;
  }
  for (int e = 0; e < n_edges; ++e) {
    int a = edges[2 * e], b = edges[2 * e + 1];
    w->neigh[a].push_back(b);
    w->neigh[b].push_back(a);
    const double* pa = &w->xyz[3 * a];
    const double* pb = &w->xyz[3 * b];
    double dx = pb[0] - pa[0], dy = pb[1] - pa[1], dz = pb[2] - pa[2];
    double d = std::sqrt(dx * dx + dy * dy + dz * dz);
    size_t ab = static_cast<size_t>(a) * n_nodes + b;
    size_t ba = static_cast<size_t>(b) * n_nodes + a;
    if (d < w->dist[ab]) {
      w->dist[ab] = w->dist[ba] = d;
      w->next[ab] = b;
      w->next[ba] = a;
      w->hops[ab] = w->hops[ba] = 1;
    }
  }
  for (auto& v : w->neigh) {
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
  }
  // Floyd-Warshall with next-hop/hop-count reconstruction
  int n = n_nodes;
  for (int k = 0; k < n; ++k) {
    const double* dk = &w->dist[static_cast<size_t>(k) * n];
    for (int i = 0; i < n; ++i) {
      double dik = w->dist[static_cast<size_t>(i) * n + k];
      if (dik >= kInf) continue;
      double* di = &w->dist[static_cast<size_t>(i) * n];
      int* ni = &w->next[static_cast<size_t>(i) * n];
      int* hi = &w->hops[static_cast<size_t>(i) * n];
      int nik = ni[k];
      int hik = hi[k];
      const int* hk = &w->hops[static_cast<size_t>(k) * n];
      for (int j = 0; j < n; ++j) {
        double alt = dik + dk[j];
        if (alt < di[j]) {
          di[j] = alt;
          ni[j] = nik;
          hi[j] = hik + hk[j];
        }
      }
    }
  }
  return w;
}

void vln_world_destroy(void* wp) { delete static_cast<World*>(wp); }

void vln_world_allpairs(void* wp, double* dist, int* next_hop, int* hops) {
  World* w = static_cast<World*>(wp);
  size_t nn = static_cast<size_t>(w->n) * w->n;
  std::memcpy(dist, w->dist.data(), nn * sizeof(double));
  std::memcpy(next_hop, w->next.data(), nn * sizeof(int));
  for (size_t i = 0; i < nn; ++i)
    hops[i] = std::min(w->hops[i], 1 << 28);
}

int vln_world_degree(void* wp, int node) {
  World* w = static_cast<World*>(wp);
  return static_cast<int>(w->neigh[node].size());
}

// -------------------------------------------------------------- sim
void* vln_sim_create(void* world, int views) {
  Sim* s = new Sim();
  s->world = static_cast<World*>(world);
  s->views = views;
  return s;
}

void vln_sim_destroy(void* sp) { delete static_cast<Sim*>(sp); }

void vln_sim_new_episode(void* sp, int node, double heading,
                         double elevation) {
  Sim* s = static_cast<Sim*>(sp);
  s->node = node;
  s->Snap(heading, elevation);
}

// index > 0 moves to navigableLocations[index] (current node first, then
// neighbours in slot order); heading/elevation deltas in 30-degree units.
void vln_sim_make_action(void* sp, int index, double heading_delta,
                         double elevation_delta) {
  Sim* s = static_cast<Sim*>(sp);
  if (index > 0) {
    const auto& nb = s->world->neigh[s->node];
    int j = index - 1;
    if (j >= 0 && j < static_cast<int>(nb.size())) s->node = nb[j];
  }
  double h = s->heading + heading_delta * (2 * kPi / s->PerRow());
  double e = s->elevation + elevation_delta * (kPi / 6.0);
  e = std::min(std::max(e, -kPi / 6.0), kPi / 6.0);
  s->Snap(h, e);
}

void vln_sim_get_state(void* sp, int* node, double* heading,
                       double* elevation, int* view_index) {
  Sim* s = static_cast<Sim*>(sp);
  *node = s->node;
  *heading = s->heading;
  *elevation = s->elevation;
  *view_index = s->view_index;
}

// navigableLocations: returns count; arrays hold the neighbours (current
// node excluded) with headings/elevations relative to the current pose.
int vln_sim_navigable(void* sp, int max_out, int* nodes, double* rel_heading,
                      double* rel_elevation) {
  Sim* s = static_cast<Sim*>(sp);
  const auto& nb = s->world->neigh[s->node];
  int n = std::min<int>(nb.size(), max_out);
  for (int i = 0; i < n; ++i) {
    double h, e;
    s->world->HeadingElevation(s->node, nb[i], &h, &e);
    nodes[i] = nb[i];
    rel_heading[i] = WrapPi(h - s->heading);
    rel_elevation[i] = e - s->elevation;
  }
  return n;
}

// make_candidate-equivalent: absolute angles + closest discretized view.
int vln_sim_candidates(void* sp, int max_out, int* nodes, int* pointids,
                       double* headings, double* elevations) {
  Sim* s = static_cast<Sim*>(sp);
  const auto& nb = s->world->neigh[s->node];
  int n = std::min<int>(nb.size(), max_out);
  for (int i = 0; i < n; ++i) {
    double h, e;
    s->world->HeadingElevation(s->node, nb[i], &h, &e);
    nodes[i] = nb[i];
    pointids[i] = ClosestView(h, e, s->views);
    headings[i] = h;
    elevations[i] = e;
  }
  return n;
}

// ------------------------------------------------------------- bank
void* vln_bank_open(const char* path, int64_t rows, int row_floats) {
  Bank* b = new Bank();
  b->fd = open(path, O_RDONLY);
  if (b->fd < 0) {
    delete b;
    return nullptr;
  }
  b->rows = rows;
  b->row_floats = row_floats;
  b->bytes = static_cast<size_t>(rows) * row_floats * sizeof(float);
  void* p = mmap(nullptr, b->bytes, PROT_READ, MAP_SHARED, b->fd, 0);
  if (p == MAP_FAILED) {
    close(b->fd);
    delete b;
    return nullptr;
  }
  b->data = static_cast<const float*>(p);
  return b;
}

void vln_bank_close(void* bp) {
  Bank* b = static_cast<Bank*>(bp);
  if (b->data) munmap(const_cast<float*>(b->data), b->bytes);
  if (b->fd >= 0) close(b->fd);
  delete b;
}

void vln_bank_gather(void* bp, const int64_t* row_ids, int n, float* out) {
  Bank* b = static_cast<Bank*>(bp);
  size_t rf = b->row_floats;
  for (int i = 0; i < n; ++i) {
    int64_t r = row_ids[i];
    if (r < 0 || r >= b->rows) {
      std::memset(out + i * rf, 0, rf * sizeof(float));
    } else {
      std::memcpy(out + i * rf, b->data + static_cast<size_t>(r) * rf,
                  rf * sizeof(float));
    }
  }
}

}  // extern "C"

// ----------------------------------------------------------- prefetcher
namespace {

struct Prefetcher {
  Bank* bank = nullptr;
  int capacity = 0;
  std::vector<float> buf;       // gathered rows for the submitted job
  std::vector<int64_t> rows;    // pending row ids
  int pending_n = 0;            // rows in the submitted (unfinished) job
  int ready_n = -1;             // rows gathered and waiting for wait()
  bool stop = false;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;

  void Run() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      cv.wait(lk, [&] { return stop || pending_n > 0; });
      if (stop) return;
      int n = pending_n;
      std::vector<int64_t> ids(rows.begin(), rows.begin() + n);
      lk.unlock();
      vln_bank_gather(bank, ids.data(), n, buf.data());
      lk.lock();
      pending_n = 0;
      ready_n = n;
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* vln_prefetch_create(void* bank, int capacity) {
  Prefetcher* p = new Prefetcher();
  p->bank = static_cast<Bank*>(bank);
  p->capacity = capacity;
  p->buf.resize(static_cast<size_t>(capacity) * p->bank->row_floats);
  p->rows.resize(capacity);
  p->worker = std::thread([p] { p->Run(); });
  return p;
}

// Enqueue the next batch's rows (n <= capacity).  One job may be in flight;
// submitting while the previous result was never collected blocks until the
// worker finishes it, then discards that result.
void vln_prefetch_submit(void* pp, const int64_t* row_ids, int n) {
  Prefetcher* p = static_cast<Prefetcher*>(pp);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv.wait(lk, [&] { return p->pending_n == 0; });
  p->ready_n = -1;
  if (n > p->capacity) n = p->capacity;
  std::copy(row_ids, row_ids + n, p->rows.begin());
  p->pending_n = n;
  p->cv.notify_all();
}

// Block until the submitted job completes and copy the gathered rows into
// out ([n, row_floats]).  Returns the row count, or -1 if nothing was
// submitted since the last wait.
int vln_prefetch_wait(void* pp, float* out) {
  Prefetcher* p = static_cast<Prefetcher*>(pp);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->pending_n == 0 && p->ready_n < 0) return -1;
  p->cv.wait(lk, [&] { return p->ready_n >= 0; });
  int n = p->ready_n;
  std::memcpy(out, p->buf.data(),
              static_cast<size_t>(n) * p->bank->row_floats * sizeof(float));
  p->ready_n = -1;
  return n;
}

void vln_prefetch_destroy(void* pp) {
  Prefetcher* p = static_cast<Prefetcher*>(pp);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv.notify_all();
  }
  p->worker.join();
  delete p;
}

}  // extern "C"
