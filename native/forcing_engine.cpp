// Asynchronous forcing engine.
//
// Native runtime component: produces per-timestep forcing fields on a
// background thread into a ring of pre-allocated buffers, so host-side
// forcing generation/IO overlaps with device compute (the role a C++
// data-loader plays in the reference's ecosystem; the reference snapshot
// itself only has constant DummyExternalData, core/src/include/
// DummyExternalData.hpp:22-34).
//
// Modes:
//   0 = constant fields
//   1 = moving cyclone: the standard sea-ice dynamics benchmark wind forcing
//       (a vortex of radius r0 whose center crosses the domain diagonally)
//       plus a steady circular ocean current.
//   2 = binary forcing file: sequential f64 planes read ahead of the model
//       on the producer thread. Format: i64 magic 0x4E584654 ("NXFT"),
//       i64 nx, ny, n_fields, n_steps, then n_steps records of
//       n_fields*nx*ny doubles. Optionally loops (climatology-style).
//
// Buffer layout per step: n_fields planes of nx*ny doubles, C-order (x, y):
//   mode 1 fields: [u_atm, v_atm, u_ocean, v_ocean] at CG nodes (owned-node
//   layout: node (i, j) at (i*dx, j*dy)).
//
// C API (ctypes-friendly): fe_create / fe_start / fe_acquire / fe_release /
// fe_stop / fe_destroy. fe_acquire blocks until a produced buffer is ready
// and yields (pointer, step); fe_release recycles the oldest acquired
// buffer. Producer stays `lookahead = n_buffers` steps ahead at most.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct CycloneParams {
    double dx, dy;          // node spacing [m]
    double lx, ly;          // domain size [m]
    double vmax_atm;        // peak cyclone wind [m/s]
    double r0;              // cyclone radius scale [m]
    double period;          // time for the center to cross the domain [s]
    double vmax_ocean;      // ocean gyre speed [m/s]
    double dt;              // forcing timestep [s]
};

class ForcingEngine {
public:
    ForcingEngine(int64_t nx, int64_t ny, int64_t n_fields, int64_t n_buffers)
        : nx_(nx), ny_(ny), n_fields_(n_fields), n_buffers_(n_buffers),
          plane_(nx * ny), stop_flag_(false), next_step_(0) {
        buffers_.resize(n_buffers_);
        for (auto& b : buffers_) b.resize(n_fields_ * plane_);
        for (int64_t i = 0; i < n_buffers_; ++i) free_.push_back(i);
    }

    ~ForcingEngine() {
        stop();
        if (file_) std::fclose(file_);
    }

    void start_constant(const double* values) {
        const_values_.assign(values, values + n_fields_);
        mode_ = 0;
        launch();
    }

    void start_cyclone(const CycloneParams& p) {
        params_ = p;
        mode_ = 1;
        launch();
    }

    // Returns 0 on success, nonzero on a malformed/mismatched file.
    int start_file(const char* path, int loop) {
        file_ = std::fopen(path, "rb");
        if (!file_) return 1;
        int64_t header[5];
        if (std::fread(header, sizeof(int64_t), 5, file_) != 5) return 2;
        if (header[0] != 0x4E584654) return 3;  // "NXFT"
        if (header[1] != nx_ || header[2] != ny_ || header[3] != n_fields_) return 4;
        file_steps_ = header[4];
        file_loop_ = loop != 0;
        mode_ = 2;
        launch();
        return 0;
    }

    // Blocks until a produced buffer is available; returns its pointer and
    // the step index it holds. Returns false after stop().
    bool acquire(double** data, int64_t* step) {
        std::unique_lock<std::mutex> lock(mu_);
        ready_cv_.wait(lock, [&] { return !ready_.empty() || stop_flag_; });
        if (ready_.empty()) return false;
        Slot s = ready_.front();
        ready_.pop_front();
        acquired_.push_back(s);
        *data = buffers_[s.buffer].data();
        *step = s.step;
        return true;
    }

    // Recycle the oldest acquired buffer back to the producer.
    void release() {
        std::lock_guard<std::mutex> lock(mu_);
        if (acquired_.empty()) return;
        free_.push_back(acquired_.front().buffer);
        acquired_.pop_front();
        free_cv_.notify_one();
    }

    void stop() {
        {
            std::lock_guard<std::mutex> lock(mu_);
            if (stop_flag_) return;
            stop_flag_ = true;
        }
        free_cv_.notify_all();
        ready_cv_.notify_all();
        if (worker_.joinable()) worker_.join();
    }

private:
    struct Slot {
        int64_t buffer;
        int64_t step;
    };

    void launch() {
        worker_ = std::thread([this] { run(); });
    }

    void run() {
        while (true) {
            int64_t buffer;
            {
                std::unique_lock<std::mutex> lock(mu_);
                free_cv_.wait(lock, [&] { return !free_.empty() || stop_flag_; });
                if (stop_flag_) return;
                buffer = free_.front();
                free_.pop_front();
            }
            const int64_t step = next_step_++;
            fill(buffers_[buffer].data(), step);
            {
                std::lock_guard<std::mutex> lock(mu_);
                ready_.push_back({buffer, step});
            }
            ready_cv_.notify_one();
        }
    }

    void fill(double* out, int64_t step) {
        if (mode_ == 2) {
            const int64_t record = n_fields_ * plane_;
            int64_t index = file_loop_ ? step % file_steps_
                                       : std::min(step, file_steps_ - 1);
            const int64_t offset =
                5 * static_cast<int64_t>(sizeof(int64_t)) +
                index * record * static_cast<int64_t>(sizeof(double));
            std::fseek(file_, static_cast<long>(offset), SEEK_SET);
            size_t got = std::fread(out, sizeof(double), record, file_);
            if (got != static_cast<size_t>(record)) {
                std::memset(out + got, 0, (record - got) * sizeof(double));
            }
            return;
        }
        if (mode_ == 0) {
            for (int64_t f = 0; f < n_fields_; ++f) {
                double v = const_values_[f];
                double* plane = out + f * plane_;
                for (int64_t i = 0; i < plane_; ++i) plane[i] = v;
            }
            return;
        }
        // Moving cyclone (fields: u_atm, v_atm, u_ocean, v_ocean).
        const CycloneParams& p = params_;
        const double t = static_cast<double>(step) * p.dt;
        // Center crosses the domain diagonally once per period, wrapping.
        const double frac = std::fmod(t / p.period, 1.0);
        const double cx = frac * p.lx;
        const double cy = frac * p.ly;
        double* ua = out + 0 * plane_;
        double* va = out + 1 * plane_;
        double* uo = out + 2 * plane_;
        double* vo = out + 3 * plane_;
        const double alpha = 72.0 * M_PI / 180.0;  // inflow spiral angle
        const double ca = std::cos(alpha), sa = std::sin(alpha);
        for (int64_t i = 0; i < nx_; ++i) {
            const double x = static_cast<double>(i) * p.dx;
            for (int64_t j = 0; j < ny_; ++j) {
                const double y = static_cast<double>(j) * p.dy;
                const double rx = x - cx;
                const double ry = y - cy;
                const double r = std::sqrt(rx * rx + ry * ry);
                // Vortex profile: peak wind vmax at r = r0, exp decay beyond.
                const double s =
                    p.vmax_atm * (r / p.r0) * std::exp(1.0 - r / p.r0);
                const double inv_r = r > 1e-9 ? 1.0 / r : 0.0;
                const double ex = rx * inv_r, ey = ry * inv_r;
                // Rotate the radial unit vector by alpha: spiral inflow.
                ua[i * ny_ + j] = -s * (ca * ex - sa * ey);
                va[i * ny_ + j] = -s * (sa * ex + ca * ey);
                // Steady anticyclonic ocean gyre over the whole domain.
                uo[i * ny_ + j] = p.vmax_ocean * (2.0 * y - p.ly) / p.ly;
                vo[i * ny_ + j] = -p.vmax_ocean * (2.0 * x - p.lx) / p.lx;
            }
        }
    }

    const int64_t nx_, ny_, n_fields_, n_buffers_, plane_;
    std::vector<std::vector<double>> buffers_;
    std::deque<int64_t> free_;
    std::deque<Slot> ready_;
    std::deque<Slot> acquired_;
    std::mutex mu_;
    std::condition_variable free_cv_, ready_cv_;
    std::thread worker_;
    bool stop_flag_;
    std::atomic<int64_t> next_step_;
    int mode_ = 0;
    std::vector<double> const_values_;
    CycloneParams params_{};
    std::FILE* file_ = nullptr;
    int64_t file_steps_ = 0;
    bool file_loop_ = false;
};

}  // namespace

extern "C" {

void* fe_create(int64_t nx, int64_t ny, int64_t n_fields, int64_t n_buffers) {
    return new ForcingEngine(nx, ny, n_fields, n_buffers);
}

void fe_start_constant(void* handle, const double* values) {
    static_cast<ForcingEngine*>(handle)->start_constant(values);
}

void fe_start_cyclone(void* handle, double dx, double dy, double lx, double ly,
                      double vmax_atm, double r0, double period,
                      double vmax_ocean, double dt) {
    CycloneParams p{dx, dy, lx, ly, vmax_atm, r0, period, vmax_ocean, dt};
    static_cast<ForcingEngine*>(handle)->start_cyclone(p);
}

int fe_start_file(void* handle, const char* path, int loop) {
    return static_cast<ForcingEngine*>(handle)->start_file(path, loop);
}

int fe_acquire(void* handle, double** data, int64_t* step) {
    return static_cast<ForcingEngine*>(handle)->acquire(data, step) ? 1 : 0;
}

void fe_release(void* handle) { static_cast<ForcingEngine*>(handle)->release(); }

void fe_stop(void* handle) { static_cast<ForcingEngine*>(handle)->stop(); }

void fe_destroy(void* handle) { delete static_cast<ForcingEngine*>(handle); }

}  // extern "C"
