// Headless stub replacing GLEW for building the reference core without GL.
#ifndef STUB_GLEW_H
#define STUB_GLEW_H
typedef float GLfloat; typedef double GLdouble; typedef int GLint;
typedef unsigned int GLuint; typedef unsigned int GLenum; typedef unsigned char GLboolean;
typedef int GLsizei; typedef void GLvoid; typedef unsigned int GLbitfield;
#define GL_STUB_ENUM(name) static const GLenum name = __COUNTER__;
GL_STUB_ENUM(GL_TRIANGLES) GL_STUB_ENUM(GL_LINES) GL_STUB_ENUM(GL_LINE_STRIP)
GL_STUB_ENUM(GL_LINE_LOOP) GL_STUB_ENUM(GL_POINTS) GL_STUB_ENUM(GL_QUADS)
GL_STUB_ENUM(GL_POLYGON) GL_STUB_ENUM(GL_RGBA) GL_STUB_ENUM(GL_UNSIGNED_BYTE)
GL_STUB_ENUM(GL_PROJECTION) GL_STUB_ENUM(GL_MODELVIEW) GL_STUB_ENUM(GL_PROJECTION_MATRIX)
GL_STUB_ENUM(GL_MODELVIEW_MATRIX) GL_STUB_ENUM(GL_DEPTH_TEST) GL_STUB_ENUM(GL_LIGHTING)
GL_STUB_ENUM(GL_BLEND) GL_STUB_ENUM(GL_LINE_SMOOTH) GL_STUB_ENUM(GL_LINE_SMOOTH_HINT)
GL_STUB_ENUM(GL_NICEST) GL_STUB_ENUM(GL_TEXTURE_2D) GL_STUB_ENUM(GL_FRONT)
GL_STUB_ENUM(GL_DIFFUSE) GL_STUB_ENUM(GL_SHININESS) GL_STUB_ENUM(GL_VERTEX_ARRAY)
GL_STUB_ENUM(GL_NORMAL_ARRAY) GL_STUB_ENUM(GL_DOUBLE) GL_STUB_ENUM(GL_POLYGON_OFFSET_FILL)
GL_STUB_ENUM(GL_LIGHT0) GL_STUB_ENUM(GL_NORMALIZE) GL_STUB_ENUM(GL_COLOR_MATERIAL)
GL_STUB_ENUM(GL_DEPTH_BUFFER_BIT) GL_STUB_ENUM(GL_COLOR_BUFFER_BIT) GL_STUB_ENUM(GL_VIEWPORT)
static inline void glBegin(GLenum){} static inline void glEnd(){}
static inline void glColor3fv(const float*){} static inline void glColor4f(float,float,float,float){}
static inline void glColor4fv(const float*){} static inline void glVertex2f(float,float){}
static inline void glVertex3d(double,double,double){} static inline void glVertex3dv(const double*){}
static inline void glVertex3f(float,float,float){} static inline void glVertex3i(int,int,int){}
static inline void glNormal3dv(const double*){} static inline void glLineWidth(float){}
static inline void glPointSize(float){} static inline void glEnable(GLenum){}
static inline void glDisable(GLenum){} static inline GLboolean glIsEnabled(GLenum){return 0;}
static inline void glMatrixMode(GLenum){} static inline void glLoadIdentity(){}
static inline void glOrtho(double,double,double,double,double,double){}
static inline void glViewport(int,int,int,int){} static inline void glPushMatrix(){}
static inline void glPopMatrix(){} static inline void glPushAttrib(GLbitfield){}
static inline void glPopAttrib(){} static inline void glTranslated(double,double,double){}
static inline void glTranslatef(float,float,float){} static inline void glScaled(double,double,double){}
static inline void glDrawPixels(int,int,GLenum,GLenum,const void*){}
static inline void glGetDoublev(GLenum,double* p){ for(int i=0;i<16;++i) p[i]=(i%5==0);}
static inline void glGetIntegerv(GLenum,int* p){ p[0]=p[1]=0; p[2]=p[3]=1; }
static inline void glHint(GLenum,GLenum){} static inline void glDepthMask(GLboolean){}
static inline void glBindTexture(GLenum,GLuint){} static inline void glMaterialfv(GLenum,GLenum,const float*){}
static inline void glMateriali(GLenum,GLenum,int){} static inline void glPolygonOffset(float,float){}
static inline void glEnableClientState(GLenum){} static inline void glDisableClientState(GLenum){}
static inline void glVertexPointer(int,GLenum,int,const void*){}
static inline void glNormalPointer(GLenum,int,const void*){}
static inline void glDrawElements(GLenum,int,GLenum,const void*){}
static inline void glClear(GLbitfield){} static inline void glClearColor(float,float,float,float){}
static inline void gluPerspective(double,double,double,double){}
static inline void gluLookAt(double,double,double,double,double,double,double,double,double){}
static inline GLenum glewInit(){return 0;}
#define GLEW_OK 0
GL_STUB_ENUM(GL_AMBIENT)
GL_STUB_ENUM(GL_ENABLE_BIT)
GL_STUB_ENUM(GL_FRONT_AND_BACK)
GL_STUB_ENUM(GL_POINT_SMOOTH)
GL_STUB_ENUM(GL_POINT_SMOOTH_HINT)
GL_STUB_ENUM(GL_POLYGON_SMOOTH)
GL_STUB_ENUM(GL_POLYGON_SMOOTH_HINT)
GL_STUB_ENUM(GL_SPECULAR)
GL_STUB_ENUM(GL_UNSIGNED_INT)
GL_STUB_ENUM(GL_VIEWPORT_BIT)
#define GL_TRUE 1
#define GL_FALSE 0

#endif
