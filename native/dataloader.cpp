// Threaded prefetching dataset loader — the native runtime data path.
//
// The reference's example binaries read + decode every frame inline on the
// tracking thread (mono_icl_test.cc:101-123: cv::imread in the frame loop),
// stalling the pipeline on disk + PNG inflate.  Here decode runs on a worker
// pool ahead of the consumer with a bounded ring of pre-allocated float32
// grayscale buffers, so the Python host loop (and the TPU) never waits on
// I/O.  Exposed as a C ABI consumed via ctypes (native/__init__.py wrapper
// in tpuslam.io.native_loader).
//
// Build: see native/build.sh (g++ -O3 -shared, links OpenCV imgcodecs for
// PNG/JPG decode only — no OpenCV compute anywhere in the framework).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <queue>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

namespace {

struct Item {
  int index = -1;
  double stamp = 0.0;
  int h = 0, w = 0;
  std::vector<float> gray;   // h*w, [0,255]
  std::vector<float> depth;  // h*w metres, empty if none
};

struct Loader {
  std::vector<std::pair<double, std::string>> rgb;
  std::vector<std::string> depth;
  double depth_factor = 5000.0;

  std::mutex mu;
  std::condition_variable cv_full, cv_space;
  std::queue<Item> ready;
  size_t capacity = 8;
  std::atomic<int> next_to_schedule{0};
  int next_to_emit = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  // out-of-order completion buffer: index -> item
  std::mutex omu;
  std::vector<Item> pending;

  ~Loader() { shutdown(); }

  void shutdown() {
    stop = true;
    cv_space.notify_all();
    cv_full.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  void worker() {
    for (;;) {
      int idx = next_to_schedule.fetch_add(1);
      if (stop || idx >= static_cast<int>(rgb.size())) return;
      Item item;
      item.index = idx;
      item.stamp = rgb[idx].first;
      cv::Mat img = cv::imread(rgb[idx].second, cv::IMREAD_GRAYSCALE);
      if (!img.empty()) {
        item.h = img.rows;
        item.w = img.cols;
        item.gray.resize(static_cast<size_t>(img.rows) * img.cols);
        for (int r = 0; r < img.rows; ++r) {
          const uint8_t* row = img.ptr<uint8_t>(r);
          float* dst = item.gray.data() + static_cast<size_t>(r) * img.cols;
          for (int c = 0; c < img.cols; ++c) dst[c] = static_cast<float>(row[c]);
        }
      }
      if (idx < static_cast<int>(depth.size()) && !depth[idx].empty()) {
        cv::Mat d = cv::imread(depth[idx], cv::IMREAD_UNCHANGED);
        if (!d.empty() && d.type() == CV_16U) {
          item.depth.resize(static_cast<size_t>(d.rows) * d.cols);
          const float inv = 1.0f / static_cast<float>(depth_factor);
          for (int r = 0; r < d.rows; ++r) {
            const uint16_t* row = d.ptr<uint16_t>(r);
            float* dst = item.depth.data() + static_cast<size_t>(r) * d.cols;
            for (int c = 0; c < d.cols; ++c) dst[c] = row[c] * inv;
          }
        }
      }
      // hand the item to the in-order emitter
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return stop || ready.size() < capacity + pending.size() + 64; });
      if (stop) return;
      pending.push_back(std::move(item));
      // drain everything now emittable in order
      bool emitted = true;
      while (emitted) {
        emitted = false;
        for (size_t i = 0; i < pending.size(); ++i) {
          if (pending[i].index == next_to_emit) {
            ready.push(std::move(pending[i]));
            pending.erase(pending.begin() + i);
            ++next_to_emit;
            emitted = true;
            break;
          }
        }
      }
      cv_full.notify_all();
    }
  }
};

bool read_list(const std::string& folder, const std::string& list_file,
               std::vector<std::pair<double, std::string>>* out) {
  std::ifstream f(folder + "/" + list_file);
  if (!f.good()) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double stamp;
    std::string rel;
    if (ss >> stamp >> rel) out->emplace_back(stamp, folder + "/" + rel);
  }
  return true;
}

}  // namespace

extern "C" {

void* dl_open(const char* folder, const char* rgb_list, const char* depth_list,
              double depth_factor, int n_threads, int prefetch) {
  auto* L = new Loader();
  if (!read_list(folder, rgb_list, &L->rgb)) {
    delete L;
    return nullptr;
  }
  if (depth_list && depth_list[0]) {
    std::vector<std::pair<double, std::string>> d;
    if (read_list(folder, depth_list, &d)) {
      L->depth.resize(L->rgb.size());
      for (size_t i = 0; i < d.size() && i < L->depth.size(); ++i)
        L->depth[i] = d[i].second;
    }
  }
  L->depth_factor = depth_factor;
  L->capacity = prefetch > 0 ? prefetch : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int dl_count(void* h) {
  return static_cast<Loader*>(h)->rgb.size();
}

// Blocking pop of the next frame in order.  Returns the frame index, or -1
// at end of stream.  Buffers must be h*w floats (call dl_peek_dims first).
int dl_next(void* h, float* gray_out, float* depth_out, int* hw, double* stamp) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_full.wait(lk, [&] {
    return L->stop || !L->ready.empty() ||
           (L->next_to_emit >= static_cast<int>(L->rgb.size()) && L->pending.empty() &&
            L->ready.empty());
  });
  if (L->ready.empty()) return -1;
  Item item = std::move(L->ready.front());
  L->ready.pop();
  L->cv_space.notify_all();
  lk.unlock();
  hw[0] = item.h;
  hw[1] = item.w;
  *stamp = item.stamp;
  if (gray_out && !item.gray.empty())
    std::memcpy(gray_out, item.gray.data(), item.gray.size() * sizeof(float));
  if (depth_out) {
    if (!item.depth.empty())
      std::memcpy(depth_out, item.depth.data(), item.depth.size() * sizeof(float));
    else if (item.h > 0)
      std::fill(depth_out, depth_out + static_cast<size_t>(item.h) * item.w, -1.0f);
  }
  return item.index;
}

void dl_close(void* h) {
  delete static_cast<Loader*>(h);
}

}  // extern "C"
