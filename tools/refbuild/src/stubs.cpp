// Headless stubs: OSDText and Viewer without freetype/GLFW/GL.
#include "CGL/osdtext.h"
#include "CGL/viewer.h"
const std::string osdfont_base64_1, osdfont_base64_2, osdfont_base64_3,
                  osdfont_base64_4, osdfont_base64_5, osdfont_base64_6;
namespace CGL {
OSDText::OSDText() : use_hdpi(false), sx(1), sy(1), next_id(0), font(nullptr),
                     font_size(0), ft(nullptr), face(nullptr) {}
OSDText::~OSDText() {}
int OSDText::init(bool) { return 0; }
void OSDText::render() {}
void OSDText::clear() {}
void OSDText::resize(size_t, size_t) {}
int OSDText::add_line(float, float, std::string, size_t, Color) { return next_id++; }
void OSDText::del_line(int) {}
void OSDText::set_anchor(int, float, float) {}
void OSDText::set_text(int, std::string) {}
void OSDText::set_size(int, size_t) {}
void OSDText::set_color(int, Color) {}
void OSDText::draw_line(OSDLine) {}

bool Viewer::HDPI = false;
int Viewer::framecount = 0;
std::chrono::time_point<std::chrono::system_clock> Viewer::sys_last;
std::chrono::time_point<std::chrono::system_clock> Viewer::sys_curr;
bool Viewer::showInfo = false;
GLFWwindow* Viewer::window = nullptr;
size_t Viewer::buffer_w = 0;
size_t Viewer::buffer_h = 0;
Renderer* Viewer::renderer = nullptr;
OSDText* Viewer::osd_text = nullptr;
int Viewer::line_id_renderer = 0;
int Viewer::line_id_framerate = 0;

Viewer::Viewer() {}
Viewer::Viewer(const char*) {}
Viewer::~Viewer() {}
void Viewer::init() {}
void Viewer::start() {}
void Viewer::set_renderer(Renderer* r) { renderer = r; }
void Viewer::update() {}
void Viewer::drawInfo() {}
void Viewer::err_callback(int, const char*) {}
void Viewer::key_callback(GLFWwindow*, int, int, int, int) {}
void Viewer::resize_callback(GLFWwindow*, int, int) {}
void Viewer::cursor_callback(GLFWwindow*, double, double) {}
void Viewer::scroll_callback(GLFWwindow*, double, double) {}
void Viewer::mouse_button_callback(GLFWwindow*, int, int, int) {}
}
