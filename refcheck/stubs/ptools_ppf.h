#ifndef _PTOOLS_PPF_H
#define _PTOOLS_PPF_H
#define PPF_MAXLINE 256
int PPF_Print(int comm, const char *string, ...);
int PTC_Print(int comm, const char *string, ...);
#endif
