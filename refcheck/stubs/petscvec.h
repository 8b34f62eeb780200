#include "petstub_common.h"
