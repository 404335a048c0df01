// Head-to-head harness: drive the reference renderer (wicstas/pine) through
// its C++ API on the exact scenes pine_tpu's bench scripts use, bypassing the
// PRL JIT (system LLVM-15 cannot build the vendored LLVM-18 jit.cpp; script
// execution is not part of the timed render anyway).
//
// Scenes:
//   cbox                    — bench.py CBOX_PRL: Cornell box + 420-cone floor
//                             + diffuse/metal OBB boxes, 640x640x16spp depth 4
//   terrain <mesh.bin>      — bench_mesh.py: 99,458-tri heightfield,
//                             640x640x16spp depth 4
//   instanced <mesh.bin> <inst.bin> [spp_scale]
//                           — bench_instanced.py: N instances of a 4802-tri
//                             rock over a plane, 512x512x4spp depth 3
//
// mesh.bin: u32 nv, u32 nf, f32 v[nv*3], u32 f[nf*3]
// inst.bin: u32 n, f32 m[n*12]  (row-major upper 3x4 of the 4x4 transform)
#include <pine/core/scene.h>
#include <pine/core/film.h>
#include <pine/core/camera.h>
#include <pine/core/sampler.h>
#include <pine/core/lightsampler.h>
#include <pine/core/accel.h>
#include <pine/core/geometry.h>
#include <pine/core/material.h>
#include <pine/core/fileio.h>
#include <pine/impl/integrator/path.h>
#include <pine/impl/accel/embree.h>

#include <chrono>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>

using namespace pine;

#include <pine/core/jit.h>
namespace pine {
// LLVM JIT stub: the harness drives the C++ API directly, never PRL scripts
// (system libLLVM-15 cannot build the vendored LLVM-18 jit.cpp).
void jit_interpret(Context&, psl::string) {
  std::fprintf(stderr, "jit_interpret unavailable in harness\n");
  std::abort();
}
}  // namespace pine

static Mesh load_mesh_bin(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  uint32_t nv = 0, nf = 0;
  f.read((char*)&nv, 4);
  f.read((char*)&nf, 4);
  auto verts = psl::vector<vec3>(nv);
  auto faces = psl::vector<vec3u32>(nf);
  f.read((char*)verts.data(), size_t(nv) * 12);
  f.read((char*)faces.data(), size_t(nf) * 12);
  return Mesh(MOVE(verts), MOVE(faces));
}

static void build_cbox(Scene& scene) {
  scene.add_material("floor", DiffuseMaterial(vec3(0.9f, 0.9f, 0.9f)));
  scene.add_material("red", DiffuseMaterial(vec3(0.9f, 0.1f, 0.05f)));
  scene.add_material("green", DiffuseMaterial(vec3(0.2f, 0.9f, 0.05f)));
  scene.add_material("metal", MetalMaterial(vec3(1, 1, 1), 0.0f));

  scene.add_geometry(Rect(vec3(0, 0, 1), vec3(2, 0, 0), vec3(0, 0, 2)), "floor");
  scene.add_geometry(Rect(vec3(0, 2, 1), vec3(2, 0, 0), vec3(0, 0, 2)), "floor");
  scene.add_geometry(Rect(vec3(-1, 1, 1), vec3(0, 0, 2), vec3(0, 2, 0)), "red");
  scene.add_geometry(Rect(vec3(1, 1, 1), vec3(0, 0, 2), vec3(0, 2, 0)), "green");
  scene.add_geometry(Rect(vec3(0, 1, 2), vec3(2, 0, 0), vec3(0, 2, 0)), "floor");

  // PRL `for x in -1.0 ~ 0.1 ~ 1.0` float accumulation yields 21 x / 20 z
  // values (z stops at 1.9) = 420 cones — verified against the pine_tpu
  // interpreter's scene (21 x-values, 20 z-values).
  for (int i = 0; i < 21; i++)
    for (int j = 0; j < 20; j++) {
      float x = -1.0f + 0.1f * i, z = 0.1f * j;
      scene.add_geometry(Cone(vec3(x, 0, z), vec3(0, 1, 0), 0.05f, 0.05f), "floor");
    }

  scene.add_geometry(
      OBB(AABB(vec3(0, 0, 0), vec3(1, 1, 1)),
          translate(0.0f, 0.0f, 0.6f) * rotate_y(0.4f) * scale(0.6f, 0.6f, 0.6f)),
      "floor");
  scene.add_geometry(
      OBB(AABB(vec3(0, 0, 0), vec3(1, 1, 1)),
          translate(-0.6f, 0.0f, 1.0f) * rotate_y(-0.4f) * scale(0.6f, 1.3f, 0.6f)),
      "metal");

  scene.add_geometry(Rect(vec3(0.0f, 1.9f, 0.5f), vec3(0.1f, 0, 0), vec3(0, 0, 0.1f)),
                     EmissiveMaterial(vec3(600 * 1.0f, 600 * 0.64f, 600 * 0.185f)));

  scene.set_camera(ThinLenCamera(Film(vec2i(640, 640)), vec3(0, 1, -4), vec3(0, 1, 0), 0.25f));
}

static void build_terrain(Scene& scene, const char* mesh_bin) {
  scene.add_material("ground", DiffuseMaterial(vec3(0.75f, 0.7f, 0.6f)));
  auto mesh = load_mesh_bin(mesh_bin);
  float hmax = -1e30f;
  for (const auto& v : mesh.vertices) hmax = psl::max(hmax, v.y);
  scene.add_geometry(MOVE(mesh), "ground");
  scene.add_geometry(Rect(vec3(0.0f, 6.0f, 4.0f), vec3(1.5f, 0, 0), vec3(0, 0, 1.5f)),
                     EmissiveMaterial(vec3(300.0f, 290.0f, 260.0f)));
  scene.set_camera(ThinLenCamera(Film(vec2i(640, 640)), vec3(0.0f, hmax * 0.55f, 0.8f),
                                 vec3(0.5f, 0.2f, 5.5f), 0.7f));
}

static void build_instanced(Scene& scene, const char* mesh_bin, const char* inst_bin) {
  scene.add_geometry(Plane(vec3(0, -0.1f, 0), vec3(0, 1, 0)),
                     DiffuseMaterial(vec3(0.55f, 0.5f, 0.45f)));
  auto inst = InstancedShape(load_mesh_bin(mesh_bin));
  auto mat = DiffuseMaterial(vec3(0.6f, 0.55f, 0.5f));
  std::ifstream f(inst_bin, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", inst_bin); std::exit(2); }
  uint32_t n = 0;
  f.read((char*)&n, 4);
  for (uint32_t k = 0; k < n; k++) {
    float m[12];
    f.read((char*)m, 48);
    auto t = mat4::identity();
    for (int r = 0; r < 3; r++)
      for (int c = 0; c < 4; c++)
        t[c][r] = m[r * 4 + c];  // pine mat4 is column-major (m[col][row])
    inst.add(t, mat);
  }
  scene.add_instancing(MOVE(inst));
  scene.add_geometry(Rect(vec3(0, 30, 20), vec3(6, 0, 0), vec3(0, 0, 6)),
                     EmissiveMaterial(vec3(400.0f, 390.0f, 360.0f)));
  scene.set_camera(ThinLenCamera(Film(vec2i(512, 512)), vec3(0.0f, 6.0f, -6.0f),
                                 vec3(0.0f, 0.5f, 14.0f), 0.7f));
}

int main(int argc, char** argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: harness cbox|terrain|instanced ...\n"); return 2; }
  std::string which = argv[1];
  Scene scene;
  int spp = 16, depth = 4;
  if (which == "cbox") {
    build_cbox(scene);
  } else if (which == "terrain") {
    build_terrain(scene, argv[2]);
  } else if (which == "instanced") {
    build_instanced(scene, argv[2], argv[3]);
    spp = 4; depth = 3;
  } else {
    std::fprintf(stderr, "unknown scene %s\n", which.c_str());
    return 2;
  }

  auto integrator = PathIntegrator(EmbreeAccel(), BlueSobolSampler(spp),
                                   UniformLightSampler(), depth);
  auto t0 = std::chrono::steady_clock::now();
  integrator.render(scene);
  auto t1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(t1 - t0).count();
  std::printf("{\"scene\": \"%s\", \"wall_s\": %.3f, \"spp\": %d, \"depth\": %d}\n",
              which.c_str(), wall, spp, depth);
  if (const char* out = std::getenv("HARNESS_PNG"))
    save_film_as_image(out, scene.camera.film());
  return 0;
}
