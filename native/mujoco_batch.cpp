// Batched MuJoCo environment stepper (host-side native component).
//
// Role (SURVEY.md §2C): the reference's throughput comes from many CPU actor
// processes each wrapping the MuJoCo C engine. The TPU build keeps physics
// on-device (surreal_tpu/envs/physics); THIS component is the host-side
// oracle path — it batches the real MuJoCo engine across a thread pool for
// (a) parity/golden-trajectory validation of the JAX engine at scale,
// (b) honest CPU-reference throughput measurements (the BASELINE.md
//     denominator), and
// (c) eval-time ground-truth rollouts where exact MuJoCo dynamics are
//     wanted without touching the training path.
//
// C ABI (consumed via ctypes from surreal_tpu/envs/oracle.py):
//   mjb_create(xml_path, n_envs, n_threads) -> handle (0 on failure)
//   mjb_error() -> last error string
//   mjb_nq/nv/nu(handle)
//   mjb_set_state(handle, qpos[n*nq], qvel[n*nv])  (also resets mjData time)
//   mjb_step(handle, ctrl[n*nu], nsteps)           (parallel across envs)
//   mjb_get_state(handle, qpos_out, qvel_out)
//   mjb_forward(handle)                            (recompute derived quantities)
//   mjb_get_sensordata(handle, out[n*nsensordata])
//   mjb_destroy(handle)
//
// Build: tools/build_native.py (links against the wheel's libmujoco.so).

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <mujoco/mujoco.h>

namespace {

std::string g_error;

struct Pool {
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::function<void(int)> task;  // task(env_index)
  int n_items = 0;
  std::atomic<int> next{0};
  std::atomic<int> remaining{0};
  bool stop = false;
  int generation = 0;

  explicit Pool(int n_threads) {
    for (int t = 0; t < n_threads; ++t) {
      workers.emplace_back([this] { worker(); });
    }
  }

  void worker() {
    int seen_gen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || generation != seen_gen; });
        if (stop) return;
        seen_gen = generation;
      }
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n_items) break;
        task(i);
        if (remaining.fetch_sub(1) == 1) {
          std::lock_guard<std::mutex> lk(mu);
          cv_done.notify_all();
        }
      }
    }
  }

  void run(int n, std::function<void(int)> fn) {
    {
      std::lock_guard<std::mutex> lk(mu);
      task = std::move(fn);
      n_items = n;
      next.store(0);
      remaining.store(n);
      ++generation;
    }
    cv_work.notify_all();
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return remaining.load() == 0; });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& w : workers) w.join();
  }
};

struct Batch {
  mjModel* model = nullptr;
  std::vector<mjData*> data;
  Pool* pool = nullptr;
  int n_envs = 0;
};

}  // namespace

extern "C" {

const char* mjb_error() { return g_error.c_str(); }

void* mjb_create(const char* xml_path, int n_envs, int n_threads) {
  char err[1024] = {0};
  mjModel* m = mj_loadXML(xml_path, nullptr, err, sizeof(err));
  if (!m) {
    g_error = err;
    return nullptr;
  }
  auto* b = new Batch;
  b->model = m;
  b->n_envs = n_envs;
  b->data.resize(n_envs);
  for (int i = 0; i < n_envs; ++i) b->data[i] = mj_makeData(m);
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n_envs) n_threads = n_envs;
  if (n_threads < 1) n_threads = 1;
  b->pool = new Pool(n_threads);
  return b;
}

int mjb_nq(void* h) { return static_cast<Batch*>(h)->model->nq; }
int mjb_nv(void* h) { return static_cast<Batch*>(h)->model->nv; }
int mjb_nu(void* h) { return static_cast<Batch*>(h)->model->nu; }
int mjb_nsensordata(void* h) { return static_cast<Batch*>(h)->model->nsensordata; }

void mjb_set_state(void* h, const double* qpos, const double* qvel) {
  auto* b = static_cast<Batch*>(h);
  const int nq = b->model->nq, nv = b->model->nv;
  b->pool->run(b->n_envs, [=](int i) {
    mjData* d = b->data[i];
    mj_resetData(b->model, d);
    std::memcpy(d->qpos, qpos + (size_t)i * nq, nq * sizeof(double));
    std::memcpy(d->qvel, qvel + (size_t)i * nv, nv * sizeof(double));
    mj_forward(b->model, d);
  });
}

void mjb_step(void* h, const double* ctrl, int nsteps) {
  auto* b = static_cast<Batch*>(h);
  const int nu = b->model->nu;
  b->pool->run(b->n_envs, [=](int i) {
    mjData* d = b->data[i];
    std::memcpy(d->ctrl, ctrl + (size_t)i * nu, nu * sizeof(double));
    for (int s = 0; s < nsteps; ++s) mj_step(b->model, d);
  });
}

void mjb_forward(void* h) {
  auto* b = static_cast<Batch*>(h);
  b->pool->run(b->n_envs, [=](int i) { mj_forward(b->model, b->data[i]); });
}

void mjb_get_state(void* h, double* qpos, double* qvel) {
  auto* b = static_cast<Batch*>(h);
  const int nq = b->model->nq, nv = b->model->nv;
  for (int i = 0; i < b->n_envs; ++i) {
    std::memcpy(qpos + (size_t)i * nq, b->data[i]->qpos, nq * sizeof(double));
    std::memcpy(qvel + (size_t)i * nv, b->data[i]->qvel, nv * sizeof(double));
  }
}

void mjb_get_sensordata(void* h, double* out) {
  auto* b = static_cast<Batch*>(h);
  const int ns = b->model->nsensordata;
  for (int i = 0; i < b->n_envs; ++i) {
    std::memcpy(out + (size_t)i * ns, b->data[i]->sensordata, ns * sizeof(double));
  }
}

void mjb_destroy(void* h) {
  auto* b = static_cast<Batch*>(h);
  delete b->pool;
  for (auto* d : b->data) mj_deleteData(d);
  mj_deleteModel(b->model);
  delete b;
}

}  // extern "C"
